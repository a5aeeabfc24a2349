package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Bootstrap, Concentration, Contingency}

/** Poisson bootstrap CI, PR curve, Lorenz deciles (q270–q272). */
class BootstrapCurveSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bootstrap meanCi: constant metric gives a degenerate CI at the mean") {
    import spark.implicits._
    val ev = (1 to 500).map(u => (u.toLong, "purchase", 7.0))
      .toDF("user_id", "event_type", "value")
    val r = Bootstrap.meanCi(ev, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    assert(r.getLong(0) == 500 && r.getLong(1) == 100)
    // every resample averages the same constant
    assert(r.getDouble(2) == 7.0 && r.getDouble(3) == 7.0 && r.getDouble(4) == 7.0)
  }

  test("bca: symmetric data ≈ percentile CI; right-skew pulls accel positive and shifts the CI up") {
    import spark.implicits._
    // symmetric: per-unit values mirror around 5
    val sym = (1 to 400).map(u => (u.toLong, "purchase", (u % 11).toDouble))
      .toDF("user_id", "event_type", "value")
    val p = Bootstrap.meanCi(sym, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    val bca = Bootstrap.meanCiBca(sym, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    assert(bca.getLong(0) == 400 && bca.getLong(1) == 100)
    assert(bca.getDouble(2) == p.getDouble(2))            // same observed mean
    assert(math.abs(bca.getDouble(4)) < 0.02, s"symmetric accel ${bca.getDouble(4)}")
    // corrections ≈ 0 → BCa bounds within a hair of the percentile bounds
    assert(math.abs(bca.getDouble(5) - p.getDouble(3)) < 0.3)
    assert(math.abs(bca.getDouble(6) - p.getDouble(4)) < 0.3)
    assert(bca.getDouble(5) < bca.getDouble(2) && bca.getDouble(2) < bca.getDouble(6))

    // right-skewed: a few huge units → positive acceleration, CI shifted
    // up relative to the percentile interval
    val skew = (1 to 400).map(u =>
      (u.toLong, "purchase", if (u % 40 == 0) 100.0 else 1.0))
      .toDF("user_id", "event_type", "value")
    val ps = Bootstrap.meanCi(skew, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    val bs = Bootstrap.meanCiBca(skew, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    assert(bs.getDouble(4) > 0.01, s"skewed accel ${bs.getDouble(4)}")
    assert(bs.getDouble(5) >= ps.getDouble(3) - 1e-9,
      s"BCa lower ${bs.getDouble(5)} vs percentile ${ps.getDouble(3)}")
    assert(bs.getDouble(5) < bs.getDouble(6))
  }

  test("bootstrap meanCi: CI brackets the observed mean and is ordered") {
    import spark.implicits._
    val ev = (1 to 400).map(u => (u.toLong, "purchase", (u % 10).toDouble))
      .toDF("user_id", "event_type", "value")
    val r = Bootstrap.meanCi(ev, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    assert(r.getDouble(3) < r.getDouble(2) && r.getDouble(2) < r.getDouble(4))
    // a 95% CI on 400 uniform-ish units is tight around 4.5
    assert(r.getDouble(4) - r.getDouble(3) < 1.5)
  }

  test("prCurve: hand operating points") {
    import spark.implicits._
    val df = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "a")
    val out = Contingency.prCurve(df, col("s"), col("a"), Seq(0.0, 2.5))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(2.5) == ((2L, 0L, 0L, 1.0, 1.0)))   // clean separation
    assert(out(0.0) == ((2L, 2L, 0L, 0.5, 1.0)))   // everything predicted
  }

  test("lorenzDeciles: equality is the diagonal, concentration is a corner") {
    import spark.implicits._
    val eq = (1 to 100).map(u => (u.toLong, 5.0)).toDF("user_id", "value")
    val d = Concentration.lorenzDeciles(eq, "user_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (1 to 10).foreach(k => assert(math.abs(d(k.toLong) - k / 10.0) < 1e-9))
    val conc = ((1 to 99).map(u => (u.toLong, 0.0)) :+ (100L, 1000.0))
      .toDF("user_id", "value")
    val c = Concentration.lorenzDeciles(conc, "user_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(c(9L) == 0.0 && c(10L) == 1.0)
  }
}
