package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Circular

/** Circular statistics: Rayleigh, circular summary, Kuiper,
  * circular-linear correlation. */
class CircularSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def at(hour: Int, day: Int = 1): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:30:00")

  test("rayleigh: a single-hour spike is perfectly concentrated") {
    import spark.implicits._
    val df = Seq.fill(50)(("x", at(9))).toDF("k", "ts")
    val r = Circular.rayleighHourly(df, col("ts")).head
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Double]("rbar") == 1.0)
    assert(r.getAs[Double]("z") == 50.0)
    assert(r.getAs[Double]("p_value") == 0.0)
  }

  test("rayleigh: an exactly uniform clock has zero resultant") {
    import spark.implicits._
    val df = (0 until 24).flatMap(h => Seq.fill(3)(("x", at(h))))
      .toDF("k", "ts")
    val r = Circular.rayleighHourly(df, col("ts")).head
    // Σcos and Σsin over the full 24-point lattice cancel exactly at the
    // 12-dp literal grid (the quantized values are symmetric by
    // construction: c12(h+12) = −c12(h))
    assert(r.getAs[Double]("rbar") == 0.0)
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
  }

  test("circular summary: the midnight seam averages to 0, not noon") {
    import spark.implicits._
    val df = (Seq.fill(10)(("seam", at(23))) ++ Seq.fill(10)(("seam", at(1))) ++
        Seq.fill(7)(("nine", at(9)))).toDF("k", "ts")
    val out = Circular.hourlySummary(df, col("k"), col("ts"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val seam = out("seam")
    assert(seam.getAs[Double]("mean_hour") == 0.0,
      "a 23:00/01:00 mix peaks at midnight — the linear mean would say noon")
    // R̄ of two ±15° unit vectors = cos 15° ≈ 0.9659
    assert(math.abs(seam.getAs[Double]("rbar") - 0.965926) < 1e-6)
    val nine = out("nine")
    assert(nine.getAs[Double]("mean_hour") == 9.0)
    assert(nine.getAs[Double]("rbar") == 1.0)
    assert(nine.getAs[Double]("circ_var") == 0.0)
    assert(nine.getAs[Double]("circ_sd") == 0.0)
  }

  test("kuiper: all mass on one weekday vs the exact-uniform baseline") {
    import spark.implicits._
    // 2024-01-07 is a Sunday (weekday 0 in the DuckDB convention)
    val spike = Seq.fill(70)(("x", Timestamp.valueOf("2024-01-07 10:00:00")))
      .toDF("k", "ts")
    val s = Circular.kuiperWeekday(spike, col("ts")).head
    // outputs are rounded to 6 dp — compare at that grain
    assert(math.abs(s.getAs[Double]("d_plus") - 6.0 / 7) < 5e-7)
    assert(math.abs(s.getAs[Double]("d_minus") - 1.0 / 7) < 5e-7)
    assert(s.getAs[Double]("v") == 1.0)
    // one event per weekday of one full week: lattice-uniform, so the
    // discrete convention's floor V = 1/7 (D⁺ = 0, D⁻ = 1/7)
    val unif = (7 until 14).map(d =>
      ("x", Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"))).toDF("k", "ts")
    val u = Circular.kuiperWeekday(unif, col("ts")).head
    assert(u.getAs[Double]("d_plus") == 0.0)
    assert(math.abs(u.getAs[Double]("v") - 1.0 / 7) < 5e-7)
  }

  test("circular-linear: a metric that IS the clock cosine correlates at r2 = 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val h = rnd.nextInt(24)
      ("x", at(h, 1 + i % 28), 5.0 + StrictMath.cos(2 * StrictMath.PI * h / 24))
    }
    val r = Circular.circularLinearCorr(rows.toDF("k", "ts", "v"),
      col("ts"), col("v")).head
    assert(r.getAs[Double]("r_xc") > 0.999999)
    // x = 5 + cos θ exactly, so corr(x, sin θ) IS the sample corr(cos,
    // sin) — the r_cs column — not zero; r² still collapses to 1
    assert(math.abs(r.getAs[Double]("r_xs") - r.getAs[Double]("r_cs")) < 1e-4)
    assert(r.getAs[Double]("r2") > 0.9999)
  }

  test("circular-linear: a constant metric has undefined correlations") {
    import spark.implicits._
    val rows = (0 until 48).map(i => ("x", at(i % 24), 7.0))
    val r = Circular.circularLinearCorr(rows.toDF("k", "ts", "v"),
      col("ts"), col("v")).head
    assert(r.isNullAt(r.fieldIndex("r_xc")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }
}
