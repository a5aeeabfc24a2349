package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Trend
import graft.text.CorpusStats

/** Seasonal Mann-Kendall, Bartels RVN, Cox-Stuart, token burstiness. */
class TrendRandomnessSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(d: Int) = Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 10, 0).plusDays(d - 1))

  test("seasonal MK: a weekly sawtooth with no cross-week trend scores S = 0") {
    import spark.implicits._
    // value depends ONLY on weekday — within each stratum all days tie
    val rows = (1 to 28).map(d => (day(d), ((d - 1) % 7 + 1) * 10.0))
    val r = Trend.seasonalMannKendall(rows.toDF("ts", "v"), "ts", "v").head
    assert(r.getAs[Long]("n_days") == 28L)
    assert(r.getAs[Long]("s_stat") == 0L)
    // all within-stratum comparisons are ties → variance fully corrected
    assert(r.getAs[Double]("var_s") == 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("seasonal MK: sawtooth PLUS a cross-week rise is detected") {
    import spark.implicits._
    val rows = (1 to 28).map(d =>
      (day(d), ((d - 1) % 7 + 1) * 10.0 + d * 0.5))
    val r = Trend.seasonalMannKendall(rows.toDF("ts", "v"), "ts", "v").head
    // each stratum has 4 strictly increasing values: S = 7 * C(4,2) = 42
    assert(r.getAs[Long]("s_stat") == 42L)
    assert(r.getAs[Double]("z") > 3.0)
  }

  test("bartels RVN: alternating series scores far above 2, trend far below") {
    import spark.implicits._
    val alt = (1 to 30).map(d => (day(d), if (d % 2 == 0) 100.0 else 10.0))
    val ra = Trend.bartelsRvn(alt.toDF("ts", "v"), "ts", "v").head
    assert(ra.getAs[Double]("rvn") > 3.0)
    assert(ra.getAs[Double]("z") > 3.0)
    val tr = (1 to 30).map(d => (day(d), d * 5.0))
    val rt = Trend.bartelsRvn(tr.toDF("ts", "v"), "ts", "v").head
    // perfect trend: successive rank diffs are all 1 → RVN tiny
    assert(rt.getAs[Double]("rvn") < 0.1)
    assert(rt.getAs[Double]("z") < -3.0)
  }

  test("bartels RVN matches the brute rank formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val xs = (1 to 25).map(d => (d, math.rint(rnd.nextDouble() * 5000) / 100))
    val r = Trend.bartelsRvn(xs.map { case (d, v) => (day(d), v) }
      .toDF("ts", "v"), "ts", "v").head
    val qs = xs.map(_._2).map(v => math.rint(v * 1e6).toLong)
    def midrank(v: Long) =
      qs.count(_ < v) + (qs.count(_ == v) + 1) / 2.0
    val rs = qs.map(midrank)
    val n = rs.size
    val rbar = rs.sum / n
    val num = rs.sliding(2).map { case Seq(a, b) => (a - b) * (a - b) }.sum
    val den = rs.map(v => (v - rbar) * (v - rbar)).sum
    assert(math.abs(r.getAs[Double]("rvn") - num / den) < 5e-7)
  }

  test("cox-stuart: clean rise is all rises; flat series has no untied pairs") {
    import spark.implicits._
    val rise = (1 to 20).map(d => (day(d), d * 2.0))
    val r = Trend.coxStuart(rise.toDF("ts", "v"), "ts", "v").head
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("n_pairs") == 10L && r.getAs[Long]("n_rises") == 10L)
    assert(math.abs(r.getAs[Double]("z") - 10.0 / math.sqrt(10.0)) < 5e-4)
    // odd length: middle day unpaired → (n-1)/2 pairs
    val flat = (1 to 21).map(d => (day(d), 7.0))
    val f = Trend.coxStuart(flat.toDF("ts", "v"), "ts", "v").head
    assert(f.getAs[Long]("n_pairs") == 0L)
    assert(f.isNullAt(f.fieldIndex("z")))
  }

  test("siegel slope survives 40% outlier days where the mean slope dies") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    // true slope 2.0/day; 40% of days corrupted by huge spikes
    val rows = (1 to 30).map { d =>
      val clean = 100.0 + 2.0 * d
      (day(d), if (d % 5 < 2) clean + 5000.0 else clean)
    }
    val r = Trend.siegelSlope(rows.toDF("ts", "v"), "ts", "v").head
    assert(r.getAs[Long]("n_days") == 30L)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 0.5,
      s"repeated medians must hold the clean slope, got ${r.getAs[Double]("slope")}")
  }

  test("siegel slope on a clean line is exact") {
    import spark.implicits._
    val rows = (1 to 10).map(d => (day(d), 50.0 + 3.25 * d))
    val r = Trend.siegelSlope(rows.toDF("ts", "v"), "ts", "v").head
    assert(r.getAs[Double]("slope") == 3.25)
  }

  test("stl strength: strong weekly cycle reads high f_seasonal, noise reads low") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val seasonal = (1 to 56).map(d =>
      (day(d), 100.0 + Seq(0, 30, 5, -20, 10, -15, -10)((d - 1) % 7)))
    val rs = Trend.stlStrength(seasonal.toDF("ts", "v"), "ts", "v", 7).head
    assert(rs.getAs[Double]("f_seasonal") > 0.95)
    val noise = (1 to 56).map(d =>
      (day(d), 100.0 + math.rint(rnd.nextGaussian() * 1000) / 100))
    val rn2 = Trend.stlStrength(noise.toDF("ts", "v"), "ts", "v", 7).head
    assert(rn2.getAs[Double]("f_seasonal") < 0.5)
    // strong linear trend reads high f_trend
    val trend = (1 to 56).map(d =>
      (day(d), 100.0 + 10.0 * d + math.rint(rnd.nextGaussian() * 100) / 100))
    val rt = Trend.stlStrength(trend.toDF("ts", "v"), "ts", "v", 7).head
    assert(rt.getAs[Double]("f_trend") > 0.95)
  }

  test("turning points: alternating maximizes, monotone zeroes") {
    import spark.implicits._
    val alt = (1 to 20).map(d => (day(d), if (d % 2 == 0) 100.0 else 10.0))
    val ra = Trend.turningPoints(alt.toDF("ts", "v"), "ts", "v").head
    assert(ra.getAs[Long]("t_points") == 18L)  // every interior point
    assert(ra.getAs[Double]("z") > 3.0)
    val mono = (1 to 20).map(d => (day(d), d * 1.0))
    val rm = Trend.turningPoints(mono.toDF("ts", "v"), "ts", "v").head
    assert(rm.getAs[Long]("t_points") == 0L)
    assert(rm.getAs[Double]("z") < -3.0)
  }

  test("difference sign: monotone rise saturates, monotone fall zeroes") {
    import spark.implicits._
    val up = (1 to 25).map(d => (day(d), d * 1.0))
    val ru = Trend.differenceSign(up.toDF("ts", "v"), "ts", "v").head
    assert(ru.getAs[Long]("n_rises") == 24L)
    assert(math.abs(ru.getAs[Double]("expected") - 12.0) < 1e-9)
    assert(ru.getAs[Double]("z") > 3.0)
    val down = (1 to 25).map(d => (day(d), -d * 1.0))
    val rd = Trend.differenceSign(down.toDF("ts", "v"), "ts", "v").head
    assert(rd.getAs[Long]("n_rises") == 0L)
  }

  test("token burstiness: a clumping token out-scores an evenly spread one") {
    import spark.implicits._
    // 'spread' once in each of 8 docs; 'clump' 8 times in one doc
    val docs = (1 to 8).map(i =>
      (i.toLong, "spread " + (if (i == 1) Seq.fill(8)("clump").mkString(" ") else "filler")))
      .toDF("doc_id", "text")
    val out = CorpusStats.tokenBurstiness(docs, "doc_id", "text", 10)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    val clump = out("clump"); val spread = out("spread")
    assert(clump.getAs[Long]("cf") == 8L && clump.getAs[Long]("df") == 1L)
    assert(spread.getAs[Long]("cf") == 8L && spread.getAs[Long]("df") == 8L)
    // same cf — burstiness separates them
    assert(clump.getAs[Double]("vmr") > 5.0)
    assert(spread.getAs[Double]("vmr") == 0.0)
    assert(clump.getAs[Double]("eb") == 8.0 && spread.getAs[Double]("eb") == 1.0)
  }

  test("seasonal-naive MASE: a continued weekly pattern forecasts exactly (mase 0)") {
    import spark.implicits._
    // weekly pattern held for 30 days; one train-only bump keeps the
    // in-sample naive scale positive
    val rows = (1 to 30).map { d =>
      val base = ((d - 1) % 7 + 1) * 10.0
      (day(d), if (d == 10) base + 7.0 else base)
    }
    val r = Trend.seasonalNaiveBacktest(rows.toDF("ts", "value"), "ts", "value",
      0.8, 7).collect().head
    assert(r.getLong(0) == 24 && r.getLong(1) == 6)
    // test days repeat the weekly phase of train days exactly, EXCEPT the
    // phases forecast from the bumped day — mae reflects only the bump echo
    assert(r.getDouble(3) > 0, "scale must be positive (train bump)")
    // day 10 is phase 3; test days 25..30 are phases 4,5,6,0,1,2 — none
    // sources day 10, so every forecast is exact
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0, s"got $r")
  }

  test("page-hinkley: flat series never alarms; a step shift alarms after the step") {
    import spark.implicits._
    val flat = (1 to 40).map(d => (day(d), 50.0)).toDF("ts", "value")
    val rf = graft.analyze.Drift.pageHinkley(flat, "ts", "value", 0.0, 100.0)
      .collect().head
    assert(!rf.getBoolean(3) && rf.isNullAt(2), s"flat alarmed: $rf")
    val step = (1 to 40).map(d => (day(d), if (d <= 20) 50.0 else 450.0))
      .toDF("ts", "value")
    val rs = graft.analyze.Drift.pageHinkley(step, "ts", "value", 0.0, 100.0)
      .collect().head
    assert(rs.getBoolean(3), s"step not detected: $rs")
    assert(rs.getLong(2) > 20, s"alarm before the step: $rs")
    assert(rs.getDouble(1) > 100.0)
  }
}
