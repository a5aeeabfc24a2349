package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Contingency, RankStats, RobustStats, Trend, VarianceTests}
import graft.functions.Probit

/** Probit expression + Fligner-Killeen, Mood's median, Lilliefors,
  * cell residuals, OLS influence (q348–q352). */
class ProbitInfluenceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("Probit: known quantiles to 1e-7, Phi round-trip to 1e-6, both branches") {
    import spark.implicits._
    val ps = Seq(0.001, 0.01, 0.025, 0.05, 0.5, 0.75, 0.975, 0.99, 0.999)
    val got = ps.toDF("p").select(Probit.probit(col("p")).as("z"))
      .collect().map(_.getDouble(0))
    val exp = Seq(-3.090232306, -2.326347874, -1.959963985, -1.644853627,
      0.0, 0.674489750, 1.959963985, 2.326347874, 3.090232306)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-7) }
    // Φ(Φ⁻¹(p)) = p through the shared forward approximation
    val rt = ps.toDF("p")
      .select(col("p"),
        graft.functions.Phi.phi(Probit.probit(col("p"))).as("back"))
      .collect()
    rt.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("flignerKilleen: hand-computed two-class case; identical spreads give exactly 0") {
    import spark.implicits._
    // a = {1,2,3}, b = {10,20,30}: pooled devs {1,0,1,10,0,10} →
    // avg ranks 1.5/3.5/5.5, scores Φ⁻¹(.5 + r/14) ≈ .2719/.6745/1.2428,
    // X² = 2·3·(Ā_j−ā)²/V² ≈ 1.131
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val r = VarianceTests.flignerKilleen(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6 && r.getLong(3) == 1)
    assert(math.abs(r.getDouble(2) - 1.131) < 0.02)
    // class b = class a + 10: deviation multisets coincide → X² = 0
    val eq = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    assert(VarianceTests.flignerKilleen(eq, col("g"), col("v"))
      .collect().head.getDouble(2) == 0.0)
  }

  test("moodMedian: hand case chi2 = 6 with median 3; balanced classes give 0") {
    import spark.implicits._
    // pooled {1,2,3,10,20,30}: lower median = 3; above = {10,20,30} all
    // in b → per class (0 vs 3 above, e = 1.5): χ² = 4·1.5 = 6
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val r = RankStats.moodMedian(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 3.0)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    assert(r.getLong(4) == 1)
    // interleaved classes: identical above-rates → χ² = 0
    val bal = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("b", 4.0))
      .toDF("g", "v")
    assert(RankStats.moodMedian(bal, col("g"), col("v"))
      .collect().head.getDouble(3) == 0.0)
  }

  test("lilliefors: {1,2,3} closed form D = 0.174678; piled mass scores far higher") {
    import spark.implicits._
    // m = 2, s = 1, z = −1/0/1: D = max gap = 1/3 − Φ(−1) = 0.174678
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val r = RobustStats.lilliefors(df, "v").collect().head
    assert(r.getLong(0) == 3)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0)
    assert(math.abs(r.getDouble(3) - 0.174678) < 1e-5)
    // two-point mass at ±1: the empirical CDF jumps 0→.5 at −1 while
    // the fitted normal puts Φ(−1+...)≈.18 there → D well above .25
    val two = (Seq.fill(50)(-1.0) ++ Seq.fill(50)(1.0)).toDF("v")
    assert(RobustStats.lilliefors(two, "v").collect().head.getDouble(3) > 0.25)
    // constant column: zero variance → NULL D
    val const = Seq.fill(5)(7.0).toDF("v")
    assert(RobustStats.lilliefors(const, "v").collect().head.isNullAt(3))
  }

  test("cellResiduals: independence gives 0 everywhere; 2x2 residual² = chi2 in every cell") {
    import spark.implicits._
    val ind = Seq(("x", 0), ("x", 0), ("x", 1), ("x", 1),
      ("y", 0), ("y", 0), ("y", 1), ("y", 1)).toDF("a", "b")
    Contingency.cellResiduals(ind, col("a"), col("b")).collect()
      .foreach(r => assert(r.getDouble(4) == 0.0))
    // diagonal-heavy 2×2: every standardized residual² equals χ²
    val dep = (Seq.fill(8)(("x", 0)) ++ Seq.fill(2)(("x", 1)) ++
      Seq.fill(3)(("y", 0)) ++ Seq.fill(7)(("y", 1))).toDF("a", "b")
    val res = Contingency.cellResiduals(dep, col("a"), col("b")).collect()
    val chi2 = Contingency.chiSquare(dep, col("a"), col("b"))
      .collect().head.getDouble(3)
    res.foreach { r =>
      val sq = r.getDouble(4) * r.getDouble(4)
      assert(math.abs(sq - chi2) < 1e-2)
    }
  }

  test("olsInfluence: exact line has zero residuals; one bent endpoint is the influential day") {
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")
    val line = (0 until 20).map(i => (ts(i), 10.0 + 2.0 * i)).toDF("ts", "v")
    val lr = Trend.olsInfluence(line, "ts", "v").collect()
    lr.foreach { r =>
      assert(math.abs(r.getDouble(3)) < 1e-9) // resid
      assert(r.isNullAt(4) || r.getDouble(4) == 0.0) // s2 = 0 → NULL D
    }
    // leverage is maximal at the endpoints, minimal at the center
    assert(lr.head.getDouble(2) > lr(10).getDouble(2))
    assert(lr.last.getDouble(2) > lr(10).getDouble(2))
    // bend the last day far off the line: it gets the max Cook's D and
    // the 4/n flag; interior points stay unflagged
    val bent = (0 until 20).map(i =>
      (ts(i), if (i == 19) 200.0 else 10.0 + 2.0 * i)).toDF("ts", "v")
    val br = Trend.olsInfluence(bent, "ts", "v").collect()
    val dmax = br.maxBy(r => if (r.isNullAt(4)) -1.0 else r.getDouble(4))
    assert(dmax.getDate(0).toString == "2024-01-20")
    assert(dmax.getBoolean(5))
  }
}
