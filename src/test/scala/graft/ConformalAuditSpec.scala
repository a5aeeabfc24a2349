package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.Conformal
import graft.operators.PlanAudit

/** Conformal calibration + plan census. */
class ConformalAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("conformal coverage is near the nominal level on exchangeable data") {
    import spark.implicits._
    // deterministic pseudo-noise, same distribution in both halves
    val df = (0 until 4000).map { i =>
      ("g", i.toLong, ((i * 2654435761L) % 1000L).toDouble / 10.0)
    }.toDF("grp", "id", "v")
    val r = Conformal.splitConformal(df, "grp", "id", "v", 0.9)
      .collect().head
    assert(r.getLong(1) == 2000)
    val cov = r.getDouble(4)
    assert(cov >= 0.85 && cov <= 0.95, s"coverage $cov far from nominal 0.9")
  }

  test("conformal qhat is the exact rank statistic on a hand case") {
    import spark.implicits._
    // calib (even ids) values: mean 50; residuals known
    val rows = Seq(
      (0L, 40.0), (2L, 60.0), (4L, 50.0), (6L, 30.0), (8L, 70.0),
      (10L, 45.0), (12L, 55.0), (14L, 50.0), (16L, 50.0), (18L, 50.0),
      (1L, 50.0), (3L, 80.0)) // eval half
    val df = rows.map { case (i, v) => ("g", i, v) }.toDF("grp", "id", "v")
    val r = Conformal.splitConformal(df, "grp", "id", "v", 0.9)
      .collect().head
    assert(r.getDouble(2) == 50.0) // calib mean
    // residuals: 10,10,0,20,20,5,5,0,0,0 sorted 0,0,0,0,5,5,10,10,20,20
    // rank = ceil(11·0.9) = 10 → qhat = 20
    assert(r.getDouble(3) == 20.0)
    // eval: |50-50|=0 ≤ 20 covered; |80-50|=30 > 20 not → coverage 0.5
    assert(r.getDouble(4) == 0.5)
  }

  test("plan census counts operators; countOf spots broadcasts") {
    import spark.implicits._
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val fact = (1L to 100L).map(i => (i % 2 + 1, i)).toDF("k", "x")
    val joined = fact.join(broadcast(dim), "k").groupBy("name").count()
    val census = PlanAudit.census(joined).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.keys.exists(_.contains("BroadcastHashJoin")))
    assert(PlanAudit.countOf(joined, "BroadcastHashJoin") == 1L)
    assert(PlanAudit.countOf(joined, "CartesianProduct") == 0L)
  }
}
