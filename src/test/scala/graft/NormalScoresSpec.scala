package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Changepoint, QuantileCut, RankStats, RobustStats}

/** Van der Waerden, k-sample AD, Pettitt, QQ-normal, INT transform
  * (q353–q357). */
class NormalScoresSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("vanDerWaerden: separated groups match the hand-computed normal-scores chi2") {
    import spark.implicits._
    // {1,2,3} vs {10,20,30}: ranks 1..6, scores Φ⁻¹(i/7);
    // Ā = ∓0.60451, s² = 0.596963 → X² = 6·0.36543/0.596963 ≈ 3.6728
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val r = RankStats.vanDerWaerden(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6 && r.getLong(3) == 1)
    assert(math.abs(r.getDouble(2) - 3.6728) < 0.01)
    // identical class distributions: scores cancel exactly → X² = 0
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    assert(RankStats.vanDerWaerden(eq, col("g"), col("v"))
      .collect().head.getDouble(2) == 0.0)
  }

  test("adKSample: textbook disjoint 2x2 case = 1.727273; identical samples = 0") {
    import spark.implicits._
    // x={1,2}, y={3,4}: per-class Σ = 2.30303 each →
    // A² = (3/4)·2.30303 = 1.727273 (hand-computed blocks)
    val df = Seq(("x", 1.0), ("x", 2.0), ("y", 3.0), ("y", 4.0)).toDF("g", "v")
    val r = RobustStats.adKSample(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4 && r.getLong(3) == 1)
    assert(math.abs(r.getDouble(2) - 1.727273) < 1e-4)
    // both classes {1,2}: every N·M_a − n_i·B_a = 0 → A² = 0
    val eq = Seq(("x", 1.0), ("x", 2.0), ("y", 1.0), ("y", 2.0)).toDF("g", "v")
    assert(RobustStats.adKSample(eq, col("g"), col("v"))
      .collect().head.getDouble(2) == 0.0)
    // single distinct value: lone block's denominator is 0 → NULL
    val const = Seq(("x", 5.0), ("y", 5.0)).toDF("g", "v")
    assert(RobustStats.adKSample(const, col("g"), col("v"))
      .collect().head.isNullAt(2))
  }

  test("pettitt: level shift at day 10 gives K=100 at that day; constant series gives K=0, p=1") {
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")
    // 10 low days then 10 high: U_10 = -10·10 → K = 100,
    // p = 2exp(−60000/8400) ≈ 0.00158
    val step = (0 until 20).map(i => (ts(i), if (i < 10) 1.0 else 5.0))
      .toDF("ts", "v")
    val r = Changepoint.pettitt(step, "ts", "v").collect().head
    assert(r.getLong(0) == 20 && r.getLong(1) == 100L)
    assert(r.getDate(2).toString == "2024-01-10")
    assert(math.abs(r.getDouble(3) - 2.0 * math.exp(-60000.0 / 8400.0)) < 1e-6)
    // constant: all midranks equal → U_t = 0 for every t → K = 0, p = 1
    val const = (0 until 10).map(i => (ts(i), 7.0)).toDF("ts", "v")
    val c = Changepoint.pettitt(const, "ts", "v").collect().head
    assert(c.getLong(1) == 0L && c.getDouble(3) == 1.0)
    assert(c.getDate(2).toString == "2024-01-01") // earliest-tie rule
  }

  test("qqNormal: uniform 1..100 hits exact decile values, symmetric gaps") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val rows = RobustStats.qqNormal(df, "v", 10).collect()
    assert(rows.length == 9)
    // sample lower quantile at p=i/10 of 1..100 is exactly 10i
    rows.zipWithIndex.foreach { case (r, idx) =>
      assert(r.getDouble(0) == (idx + 1) / 10.0)
      assert(r.getDouble(1) == 10.0 * (idx + 1))
    }
    // lower-quantile deciles are symmetric about 50 while the fitted
    // mean is 50.5 → gap(0.1) + gap(0.9) = (10+90) − 2·50.5 = −1 exactly
    assert(math.abs(rows(0).getDouble(3) + rows(8).getDouble(3) + 1.0) < 1e-6)
    // theoretical median = sample mean 50.5; sample q50 = 50 → gap −0.5
    assert(math.abs(rows(4).getDouble(3) + 0.5) < 1e-9)
  }

  test("intTransform: monotone, symmetric Blom scores; exact 0 at the middle rank") {
    import spark.implicits._
    val ev = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0))
      .toDF("user_id", "value")
    val rows = QuantileCut.intTransform(ev, "user_id", "value").collect()
    val scores = rows.map(_.getDouble(2))
    assert(scores.sorted.sameElements(scores)) // ordered by key = by total
    assert(scores(2) == 0.0) // (3 − 3/8)/(5 + 1/4) = 0.5 → Φ⁻¹ = 0
    assert(math.abs(scores(0) + scores(4)) < 1e-9) // Blom symmetry
    assert(math.abs(scores(1) + scores(3)) < 1e-9)
    // ties share one score: duplicate totals map to equal scores
    val tied = Seq((1L, 5.0), (2L, 5.0), (3L, 9.0)).toDF("user_id", "value")
    val t = QuantileCut.intTransform(tied, "user_id", "value").collect()
    assert(t(0).getDouble(2) == t(1).getDouble(2))
    assert(t(2).getDouble(2) > t(0).getDouble(2))
  }
}
