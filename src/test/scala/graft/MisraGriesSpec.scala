package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate: the frequent-item guarantee and
  * count lower bounds on skewed data with vocabulary >> k (forcing both
  * the update-path decrement and the merge-path re-bound across real
  * partitions), plus the candidate+exact-rescan composition. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // ~40% of mass on 4 hot items, the rest spread over 5000 rare items
    (1 to n).map { _ =>
      if (rnd.nextDouble() < 0.4) s"hot_${rnd.nextInt(4)}"
      else s"rare_${rnd.nextInt(5000)}"
    }
  }

  test("every item with frequency > n/(k+1) survives, counts are valid lower bounds") {
    import spark.implicits._
    val k = 20
    val data = zipf(60000, 71)
    val exact = data.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val got = data.toDF("tok").repartition(16) // force per-partition states + merges
      .agg(call_function("graft_heavy_hitters", $"tok", lit(k)).as("hh"))
      .select(explode($"hh").as("c")).select($"c.item", $"c.count_lb")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k, s"state exceeded k: ${got.size}")
    val bound = data.size.toLong / (k + 1)
    exact.filter(_._2 > bound).foreach { case (item, freq) =>
      assert(got.contains(item), s"frequent item $item (freq $freq > $bound) evicted")
    }
    got.foreach { case (item, lb) =>
      val freq = exact.getOrElse(item, 0L)
      assert(lb <= freq, s"$item: lower bound $lb above true count $freq")
      assert(lb >= freq - bound, s"$item: lower bound $lb worse than freq - n/(k+1)")
    }
  }

  test("candidate sketch + exact rescan equals the exact frequency answer") {
    import spark.implicits._
    val data = zipf(30000, 72)
    val toks = data.toDF("tok").repartition(8)
    val threshold = data.size / 50.0
    val cands = toks
      .agg(call_function("graft_heavy_hitters", $"tok", lit(99)).as("hh"))
      .select(explode($"hh").as("c")).select($"c.item".as("tok"))
    val got = toks.join(broadcast(cands), "tok")
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = data.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      .filter(_._2 > threshold)
    assert(got == expect)
  }

  test("graft_heavy_hitters resolves in SQL text via extensions") {
    import spark.implicits._
    Seq("a", "a", "b").toDF("x").createOrReplaceTempView("mg_sql_probe")
    val rows = spark.sql(
      "SELECT graft_heavy_hitters(x, 10) AS hh FROM mg_sql_probe")
      .select(explode(col("hh")).as("c")).select(col("c.item"), col("c.count_lb"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 2L), ("b", 1L)))
  }

  test("non-literal k is rejected") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("x", "k")
    intercept[Exception] {
      df.agg(call_function("graft_heavy_hitters", $"x", $"k")).collect()
    }
  }
}
