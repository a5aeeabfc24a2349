package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{Trend, VarianceTests}
import graft.sim.Lof

/** k-dist profile (q403), Pettitt change point (q404),
  * Kruskal-Wallis (q405). */
class KdistPettittKwSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(d: Int) = Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 10, 0).plusDays(d - 1))

  test("kdist profile: deciles are nondecreasing; tight clusters read small") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // two tight direction clusters, ids 1..2 one per cluster (seeds)
    val pts = (0 until 60).map { i =>
      val c = i % 2
      val v = new Array[Float](6)
      v(c * 3) = 1.0f
      v(c * 3 + 1) = (rnd.nextDouble() * 0.01).toFloat
      (i + 1L, v)
    }
    val out = Lof.kdistProfile(pts.toDF("vec_id", "embedding"), "vec_id",
      "embedding", 3, 2).collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(out.map(_._1).toSeq == (1 to 9))
    val ks = out.map(_._2)
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b }, s"not monotone: ${ks.toSeq}")
    assert(ks.last < 0.001, s"tight clusters must have tiny k-dists: ${ks.toSeq}")
  }

  test("pettitt locates a step change; flat series reads p near 1") {
    import spark.implicits._
    val step = (1 to 60).map(d => (day(d), if (d <= 30) 10.0 else 50.0))
      .toDF("ts", "value")
    val r = Trend.pettitt(step, "ts", "value").collect().head
    assert(r.getLong(0) == 60)
    assert(r.getLong(2) == 30, s"change at day 30, got ${r.getLong(2)}")
    assert(r.getDouble(3) < 1e-6, s"step p must be tiny: $r")
    // strictly alternating series: no single split dominates
    val alt = (1 to 60).map(d => (day(d), if (d % 2 == 0) 10.0 else 20.0))
      .toDF("ts", "value")
    val ra = Trend.pettitt(alt, "ts", "value").collect().head
    assert(ra.getDouble(3) > 0.5, s"alternating p should be large: $ra")
  }

  test("kruskal-wallis matches the hand case and separates shifted groups") {
    import spark.implicits._
    // {1,2} vs {3,4}: ranks 1..4, R1=3, R2=7 → H = 2.4, no ties
    val small = Seq(("a", 0.01), ("a", 0.02), ("b", 0.03), ("b", 0.04))
      .toDF("cls", "v")
    val r = VarianceTests.kruskalWallis(small, col("cls"), col("v"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 2.4) < 1e-9, s"hand H: $r")
    assert(math.abs(r.getDouble(3) - 2.4) < 1e-9, s"no ties → same: $r")
    // identical distributions → H near 0; disjoint shift → H large
    val same = (1 to 300).map(i => (if (i % 3 == 0) "x" else "y", (i % 7).toDouble))
    val rs = VarianceTests.kruskalWallis(same.toDF("cls", "v"), col("cls"), col("v"))
      .collect().head
    assert(rs.getDouble(3) < 3.0, s"identical groups: $rs")
    val shifted = (1 to 300).map(i =>
      (if (i % 2 == 0) "x" else "y", (i % 7) + (if (i % 2 == 0) 100.0 else 0.0)))
    val rh = VarianceTests.kruskalWallis(shifted.toDF("cls", "v"), col("cls"), col("v"))
      .collect().head
    assert(rh.getDouble(3) > 100, s"disjoint shift must dominate: $rh")
  }

  test("content digest: row-order/partitioning-invariant, content-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "alpha", "x"), (2L, "beta", "y"), (3L, null: String, "z"))
      .toDF("id", "t", "s")
    def dig(df: org.apache.spark.sql.DataFrame) =
      graft.analyze.DatasetCard.contentDigest(df, Seq("id", "t", "s"))
        .collect().head match { case r => (r.getLong(0), r.getString(1), r.getString(2)) }
    val d1 = dig(a)
    val d2 = dig(a.orderBy(org.apache.spark.sql.functions.col("t").desc).repartition(7))
    assert(d1 == d2, "digest must be order/partitioning-invariant")
    // one changed byte → different digest
    val b = Seq((1L, "alphA", "x"), (2L, "beta", "y"), (3L, null: String, "z"))
      .toDF("id", "t", "s")
    assert(dig(b) != d1)
    // null vs the visually-empty string must differ (the chr(2) encoding)
    val c = Seq((1L, "alpha", "x"), (2L, "beta", "y"), (3L, "", "z"))
      .toDF("id", "t", "s")
    assert(dig(c) != d1)
  }
}
