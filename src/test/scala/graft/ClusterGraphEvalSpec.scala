package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Contingency, Trend}
import graft.graph.Triangles
import graft.sim.ClusterEval

/** Centroid silhouette, adjusted Rand, local clustering coefficient,
  * seasonality scan (q243–q246). */
class ClusterGraphEvalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("centroidSilhouette: separated clusters ≈ 1, single cluster = 0") {
    import spark.implicits._
    val far = ((0 until 20).map(i => (i.toLong, Seq(0.0f, (i % 3) / 100.0f), 0)) ++
      (0 until 20).map(i => (100L + i, Seq(10.0f, (i % 3) / 100.0f), 1)))
      .toDF("id", "vec", "lab")
    val r = ClusterEval.centroidSilhouette(far, "id", "vec", "lab")
      .collect().map(x => x.getInt(0) -> x.getDouble(2)).toMap
    assert(r(0) > 0.99 && r(1) > 0.99)
    val one = (0 until 10).map(i => (i.toLong, Seq(i / 10.0f, 1.0f), 7))
      .toDF("id", "vec", "lab")
    assert(ClusterEval.centroidSilhouette(one, "id", "vec", "lab")
      .collect().head.getDouble(2) == 0.0)
  }

  test("centroidSilhouette: coincident clusters score ≈ 0, not 1") {
    import spark.implicits._
    // both labels drawn from the same 4 points → centroids coincide,
    // b ≈ a, silhouette ≈ 0
    val mixed = (0 until 40).map(i =>
      (i.toLong, Seq((i % 4) * 1.0f, 0.0f), (i / 4) % 2)).toDF("id", "vec", "lab")
    val r = ClusterEval.centroidSilhouette(mixed, "id", "vec", "lab")
      .collect().map(_.getDouble(2))
    assert(r.forall(s => math.abs(s) < 0.05))
  }

  test("adjustedRand: identical partitions = 1, the 4-row hand case = -0.5") {
    import spark.implicits._
    val same = (0 until 30).map(i => (s"c${i % 3}", s"k${i % 3}")).toDF("a", "b")
    assert(Contingency.adjustedRand(same, col("a"), col("b"))
      .collect().head.getDouble(1) == 1.0)
    // A = {a,a,b,b}, B = {a,b,a,b}: sij = 0, sa = sb = 2, t = 2/3 →
    // ARI = (0 − 2/3) / (2 − 2/3) = −0.5
    val anti = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("a", "b")
    assert(Contingency.adjustedRand(anti, col("a"), col("b"))
      .collect().head.getDouble(1) == -0.5)
  }

  test("localClustering: K4 is all 1.0, a path's center is 0") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val r = Triangles.localClustering(k4, "s", "d").collect()
    assert(r.length == 4 && r.forall(x =>
      x.getLong(1) == 3 && x.getLong(2) == 3 && x.getDouble(3) == 1.0))
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val p = Triangles.localClustering(path, "s", "d").collect()
    assert(p.length == 1 && p.head.getLong(0) == 2 &&
      p.head.getLong(2) == 0 && p.head.getDouble(3) == 0.0)
  }

  test("seasonalityScan: an exact period-7 cycle scores 1.0 at p=7 and " +
    "its harmonic, below 1 elsewhere; constant series is NULL") {
    import spark.implicits._
    val rows = (0 until 56).map { i =>
      ("a", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(10, 0)),
        (i % 7) * 10.0 + 5.0)
    } ++ (0 until 56).map { i =>
      ("flat", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(10, 0)), 3.0)
    }
    val df = rows.toDF("g", "ts", "v")
    val r = Trend.seasonalityScan(df, "g", "ts", "v")
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(r(("a", 7L)).get == 1.0 && r(("a", 14L)).get == 1.0)
    assert(r(("a", 2L)).get < 0.9 && r(("a", 3L)).get < 0.9)
    assert((2 to 14).forall(p => r(("flat", p.toLong)).isEmpty))
  }
}
