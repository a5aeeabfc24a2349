package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Contingency, Experiment, RobustStats, Trend, VarianceTests}

/** ANOVA/Levene, Jarque-Bera, Ljung-Box, Durbin-Watson, V-measure, SRM,
  * SPRT, AD uniformity (q251–q261). */
class KArmStatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("anovaF: textbook 3-group case and the equal-means null") {
    import spark.implicits._
    // groups {1,2,3},{2,3,4},{6,7,8}: n=9, k=3, means 2/3/7,
    // SSB = 3·(2−4)²+3·(3−4)²+3·(7−4)² = 42, SSW = 6 →
    // F = (42/2)/(6/6) = 21, eta² = 42/48 = 0.875
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0),
      ("b", 4.0), ("c", 6.0), ("c", 7.0), ("c", 8.0)).toDF("g", "v")
    val r = VarianceTests.anovaF(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 9)
    assert(math.abs(r.getDouble(2) - 21.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 0.875) < 1e-6)
    // identical group distributions: F = 0
    val nul = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    assert(VarianceTests.anovaF(nul, col("g"), col("v"))
      .collect().head.getDouble(2) == 0.0)
  }

  test("leveneBF: unequal spreads flag, equal spreads give W = 0") {
    import spark.implicits._
    // same lower medians (2 / 20), deviations {1,0,1} vs {10,0,10}:
    // BF = one-way ANOVA on those deviations — strictly positive
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    // deviations {1,0,1} vs {10,0,10}: means 2/3, 20/3 → SSB = 54,
    // SSW = 2/3+2/9·… → W = 3.207914 (computed by hand once, pinned)
    val w = VarianceTests.leveneBF(df, col("g"), col("v")).collect().head
    assert(math.abs(w.getDouble(2) - 3.207914) < 1e-5)
    // mirror-identical spreads: deviations coincide → W = 0
    val eq = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    assert(VarianceTests.leveneBF(eq, col("g"), col("v"))
      .collect().head.getDouble(2) == 0.0)
  }

  test("jarqueBera: symmetric uniform-ish sample has 0 skew and known kurtosis") {
    import spark.implicits._
    // {1..9} symmetric: skew = 0; m2 = 60/9·... kurtosis of discrete
    // uniform n=9: m4/m2² − 3 = (2·(1.6^4·0+...)) — compute directly:
    // values centered c = −4..4: m2 = 60/9, m4 = 2·(1+16+81+256)/9 = 708/9
    // kurt = (708/9)/(60/9)² − 3 = 708·9/3600 − 3 = 1.77 − 3 = −1.23
    val df = (1 to 9).map(_.toDouble).toDF("value")
    val r = RobustStats.jarqueBera(df, "value").collect().head
    assert(r.getLong(0) == 9)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - (-1.23)) < 1e-6)
    // JB = 9/6·(0 + 1.23²/4) = 0.567...
    assert(math.abs(r.getDouble(3) - 9.0 / 6 * (1.23 * 1.23 / 4)) < 1e-3)
  }

  test("ljungBox: a period-2 alternating series has r1 near -1, big Q") {
    import spark.implicits._
    val days = (0 until 20).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
        if (i % 2 == 0) 10.0 else -10.0)
    }.toDF("ts", "value")
    val rows = Trend.ljungBox(days, "ts", "value", 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(1)._1 < -0.9 && rows(2)._1 > 0.8)
    assert(rows(3)._2 > rows(1)._2) // Q cumulative, increasing
    // white-ish constant series: zero variance → null r (guard row)
    val const = (0 until 10).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 00:00:00"), 5.0))
      .toDF("ts", "value")
    val cr = Trend.ljungBox(const, "ts", "value", 1).collect().head
    assert(cr.isNullAt(2))
  }

  test("durbinWatson: alternating residuals → DW near 4, smooth ramp → small DW") {
    import spark.implicits._
    val alt = (0 until 20).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
        100.0 + (if (i % 2 == 0) 10.0 else -10.0))
    }.toDF("ts", "value")
    val dw = Trend.durbinWatson(alt, "ts", "value").collect().head.getDouble(2)
    assert(dw > 3.5)
    // a parabola-ish smooth curve has strongly positive residual
    // autocorrelation around its OLS line → DW well below 2
    val smooth = (0 until 20).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-03-${i + 1}%02d 00:00:00"),
        (i - 10.0) * (i - 10.0))
    }.toDF("ts", "value")
    assert(Trend.durbinWatson(smooth, "ts", "value")
      .collect().head.getDouble(2) < 1.0)
  }

  test("vMeasure: perfect clustering scores 1/1/1, one-cluster collapse is complete but not homogeneous") {
    import spark.implicits._
    val perfect = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2)).toDF("c", "k")
    val p = Contingency.vMeasure(perfect, col("c"), col("k")).collect().head
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 1.0 && p.getDouble(5) == 1.0)
    val collapsed = Seq(("x", 1), ("x", 1), ("y", 1), ("y", 1)).toDF("c", "k")
    val q = Contingency.vMeasure(collapsed, col("c"), col("k")).collect().head
    assert(q.getDouble(3) == 0.0) // homogeneity: mixed single cluster
    assert(q.getDouble(4) == 1.0) // completeness: no class is split
    assert(q.getDouble(5) == 0.0) // harmonic mean
  }

  test("srmCheck: balanced split passes, injected imbalance flags") {
    import spark.implicits._
    // real md5 arms over 4000 units are near-uniform → no flag
    val ev = (1 to 4000).map(u => (u.toLong, "e")).toDF("user_id", "event_type")
    val ok = Experiment.srmCheck(ev, "user_id", 4).collect().head
    assert(ok.getLong(0) == 4000 && ok.getLong(1) == 4)
    assert(!ok.getBoolean(4))
    // keep only arm-0 and arm-1 users, then duplicate arm-0 into fake
    // distinct ids from arm-0's own space: build imbalance by FILTERing
    // one arm down instead (drop half of arm 3) — chi2 explodes
    val arm = (u: Long) => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = h.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 4
    }
    val skewed = (1 to 4000).map(_.toLong).filter(u => arm(u) != 3 || u % 4 == 0)
      .map(u => (u, "e")).toDF("user_id", "event_type")
    assert(Experiment.srmCheck(skewed, "user_id", 4).collect().head.getBoolean(4))
  }

  test("sprt: an all-converting stream accepts H1 early, an all-failing one accepts H0") {
    import spark.implicits._
    def ev(conv: Boolean) = (1 to 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        if (conv) "signup" else "view")
    }.toDF("user_id", "ts", "event_type")
    val h1 = Experiment.sprt(ev(true), "user_id", "ts",
      col("event_type") === "signup", 0.30, 0.35).collect().head
    assert(h1.getString(1) == "accept_h1")
    assert(h1.getLong(2) < 50) // ln16/ln(7/6) ≈ 18 conversions suffice
    val h0 = Experiment.sprt(ev(false), "user_id", "ts",
      col("event_type") === "signup", 0.30, 0.35).collect().head
    assert(h0.getString(1) == "accept_h0")
  }

  test("adUniformity: evenly spread mid-quantile sample scores low, edge-piled sample high") {
    import spark.implicits._
    // u_i = (i−0.5)/n — the exact uniform plotting positions: A² is
    // small (→ ~0 as n grows)
    val n = 200
    val uni = (1 to n).map(i => ((i - 0.5) / n, i.toLong)).toDF("u", "tie")
    val a = RobustStats.adUniformity(uni, col("u"), col("tie"))
      .collect().head
    assert(a.getLong(0) == n && a.getDouble(1) < 0.5)
    // everything piled at 0.99: tails empty, A² large
    val piled = (1 to n).map(i => (0.99, i.toLong)).toDF("u", "tie")
    assert(RobustStats.adUniformity(piled, col("u"), col("tie"))
      .collect().head.getDouble(1) > 50)
  }
}
