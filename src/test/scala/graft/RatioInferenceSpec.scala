package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Experiment

/** Ratio-metric inference: delta method, jackknife, post-stratification. */
class RatioInferenceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val rnd = new scala.util.Random(29)
  // per-unit (num, den) with correlated structure: heavy users have
  // more events AND more revenue
  private val units = (0 until 120).map { u =>
    val k = 1 + rnd.nextInt(9)
    val rev = math.rint((k * 3 + rnd.nextGaussian() * 2).max(0.0) * 100) / 100
    (u.toLong, rev, k.toDouble)
  }

  private def df = {
    import spark.implicits._
    // one row per unit-event; revenue booked on the first event
    units.flatMap { case (u, rev, k) =>
      (0 until k.toInt).map(i => (u, if (i == 0) rev else 0.0, 1.0))
    }.toDF("u", "x", "y")
  }

  test("delta-method ratio SE matches the brute moment computation") {
    val xs = units.map(v => math.rint(v._2 * 1e6).toLong)
    val ys = units.map(v => math.rint(v._3 * 1e6).toLong)
    val n = units.size.toDouble
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val r = sx / sy; val ybar = sy / n
    def vva(q: Seq[Long], s: Double) =
      (q.map(v => v.toDouble * v).sum - s * s / n) / (n - 1)
    val vx = vva(xs, sx); val vy = vva(ys, sy)
    val cxy = (xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum -
      sx * sy / n) / (n - 1)
    val se = math.sqrt((vx - cxy * r * 2 + vy * r * r) / (n * ybar * ybar))
    val got = Experiment.ratioDelta(df, col("u"), col("x"), col("y")).head
    assert(got.getAs[Long]("n_units") == 120L)
    assert(math.abs(got.getAs[Double]("ratio") - r) < 5e-7)
    assert(math.abs(got.getAs[Double]("se") - se) < 5e-7)
  }

  test("jackknife ratio SE matches the brute leave-one-out computation") {
    val xs = units.map(v => math.rint(v._2 * 1e6).toLong)
    val ys = units.map(v => math.rint(v._3 * 1e6).toLong)
    val n = units.size
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val reps = (0 until n).map(i =>
      math.rint((sx - xs(i)) / (sy - ys(i)) * 1e12) / 1e12)
    val rbar = reps.sum / n
    val se = math.sqrt((n - 1.0) / n *
      reps.map(v => (v - rbar) * (v - rbar)).sum)
    val got = Experiment.ratioJackknife(df, col("u"), col("x"), col("y")).head
    assert(math.abs(got.getAs[Double]("se_jack") - se) < 5e-6)
    // the two SEs agree to first order on well-behaved data
    val d = Experiment.ratioDelta(df, col("u"), col("x"), col("y")).head
    assert(math.abs(got.getAs[Double]("se_jack") - d.getAs[Double]("se")) <
      0.25 * d.getAs[Double]("se"))
  }

  test("post-stratification removes a planted stratum imbalance") {
    import spark.implicits._
    // stratum 'hi' pays 100, 'lo' pays 10 — no true arm effect, but the
    // arm split is imbalanced WITHIN strata sizes: arm1 oversamples 'hi'
    val rows =
      (0 until 60).map(i => ("hi", i < 40, 100.0 + (i % 3))) ++
      (0 until 60).map(i => ("lo", i < 20, 10.0 + (i % 3)))
    val df2 = rows.toDF("s", "a", "v")
    val got = Experiment.postStratified(df2, lit(1), col("v"), col("s"),
      col("a")).head
    // raw difference is inflated by composition; post-strat ~ 0
    assert(math.abs(got.getAs[Double]("delta_raw")) > 10.0)
    assert(math.abs(got.getAs[Double]("delta_ps")) < 1.0)
    assert(got.getAs[Long]("n_strata") == 2L)
  }

  test("post-stratification matches the brute estimator") {
    import spark.implicits._
    val rnd2 = new scala.util.Random(31)
    val rows = (0 until 200).map { i =>
      val s = Seq("a", "b", "c")(rnd2.nextInt(3))
      val arm = rnd2.nextBoolean()
      (s, arm, math.rint((s.hashCode % 7 + 20 + rnd2.nextGaussian()) * 100) / 100)
    }
    val byCell = rows.groupBy(r => (r._1, r._2))
    val strata = rows.map(_._1).distinct.filter(s =>
      byCell.contains((s, true)) && byCell.contains((s, false)))
    val nn = strata.map(s => byCell((s, true)).size + byCell((s, false)).size).sum
    val dps = strata.map { s =>
      val g1 = byCell((s, true)).map(r => math.rint(r._3 * 1e6).toLong)
      val g0 = byCell((s, false)).map(r => math.rint(r._3 * 1e6).toLong)
      val w = (g1.size + g0.size).toDouble / nn
      math.rint(w * (g1.sum.toDouble / g1.size / 1e6 -
        g0.sum.toDouble / g0.size / 1e6) * 1e12) / 1e12
    }.sum
    val got = Experiment.postStratified(rows.toDF("s", "a", "v"),
      lit(1), col("v"), col("s"), col("a")).head
    assert(math.abs(got.getAs[Double]("delta_ps") - dps) < 5e-7)
  }
}
