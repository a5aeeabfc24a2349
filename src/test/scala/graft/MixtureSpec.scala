package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Mixture

/** Domain-mixing sampler: exact reproducibility of the keep set (the
  * whole point vs rand()-sampling), under-budget sources kept whole,
  * over-budget sources thinned to ~weight, and weight math. */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // one giant source (most mass) + two small ones
  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    ((1L to 8000L).map(i => (i, "big", 50L + rnd.nextInt(50))) ++
      (8001L to 8400L).map(i => (i, "mid", 60L + rnd.nextInt(20))) ++
      (8401L to 8500L).map(i => (i, "tiny", 40L + rnd.nextInt(10))))
      .toDF("doc_id", "source", "toks")
  }

  test("keep set is a pure function of the key — identical across runs and partitionings") {
    val d = corpus()
    def ids(df: org.apache.spark.sql.DataFrame) =
      Mixture.sampleToBudget(df, "source", "toks", "doc_id")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val a = ids(d)
    val b = ids(d.repartition(13))
    assert(a == b, "sample changed across partitionings")
    assert(a.nonEmpty)
  }

  test("under-budget sources keep everything; the giant source thins to ~weight") {
    val d = corpus()
    val w = Mixture.budgetWeights(d, "source", "toks")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w("mid")._2 == 1.0 && w("tiny")._2 == 1.0)
    assert(w("big")._2 < 1.0)
    val kept = Mixture.sampleToBudget(d, "source", "toks", "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("mid") == 400L && kept("tiny") == 100L)
    val frac = kept("big").toDouble / 8000
    assert(math.abs(frac - w("big")._2) < 0.03,
      s"kept fraction $frac far from weight ${w("big")._2}")
  }

  test("weights equalize token budgets: capped at 1, budget = total/n_groups") {
    val d = corpus()
    val rows = Mixture.budgetWeights(d, "source", "toks").collect()
    val total = rows.map(_.getLong(1)).sum
    val budget = total.toDouble / rows.length
    rows.foreach { r =>
      val expect = math.min(1.0, budget / r.getLong(1))
      assert(math.abs(r.getDouble(2) - expect) < 1e-12)
    }
  }

  test("temperature weights: alpha=1 is natural shares; alpha<1 upsamples the tail") {
    import spark.implicits._
    val d = (Seq.fill(90)(("big", 100L)) ++ Seq.fill(10)(("small", 100L)))
      .toDF("source", "toks")
    val nat = Mixture.temperatureWeights(d, "source", "toks", 1.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // alpha = 1: weight == raw share, epochs == 1 (up to the 1e9 pin)
    nat.foreach { case (_, (share, w, e)) =>
      assert(math.abs(w - share) < 1e-5 && math.abs(e - 1.0) < 1e-4)
    }
    val t3 = Mixture.temperatureWeights(d, "source", "toks", 0.3)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(t3("small")._2 > 1.5, s"tail must be upsampled: ${t3("small")}")
    assert(t3("big")._2 < 1.0, s"head must be downsampled: ${t3("big")}")
    // weights normalize
    assert(math.abs(t3.values.map(_._1).sum - 1.0) < 1e-5)
  }

  test("capPerGroup keeps exactly k per over-cap group, whole under-cap groups") {
    import spark.implicits._
    val df = ((0 until 50).map(i => (i.toLong, "big")) ++
      (100 until 103).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val kept = Mixture.capPerGroup(df, "source", "doc_id", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG("big").size == 10)
    assert(byG("small") == Set(100L, 101L, 102L)) // under cap: kept whole
    // deterministic: the kept set is a pure function of the ids
    val again = Mixture.capPerGroup(df.repartition(7), "source", "doc_id", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == kept.toSet)
    // and it is the md5-hash-rank prefix, not an arbitrary subset
    val h = (k: Long) => java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(k.toString).substring(0, 8), 16)
    val expect = (0 until 50).map(_.toLong).sortBy(i => (h(i), i)).take(10).toSet
    assert(byG("big") == expect)
  }
}
