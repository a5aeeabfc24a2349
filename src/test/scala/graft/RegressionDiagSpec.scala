package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

import graft.analyze.Regression
import graft.ml.Evaluation

/** Deming (q327), Breusch-Pagan (q328), Chow (q329), Brier
  * decomposition (q325) and Hosmer-Lemeshow (q326). */
class RegressionDiagSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("deming recovers an exact line: slope 2, intercept 0, r 1") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val r = Regression.deming(df, col("x"), col("y")).collect().head
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-6)
    assert(math.abs(r.getDouble(2)) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }

  test("deming slope exceeds the OLS slope under noise in x") {
    import spark.implicits._
    // noisy-x pairs around y = x: OLS attenuates; Deming λ=1 must give
    // slope strictly above OLS's cxy/vx
    val data = Seq((0.9, 1.0), (2.1, 2.0), (2.9, 3.0), (4.2, 4.0),
      (4.8, 5.0))
    val df = data.toDF("x", "y")
    val r = Regression.deming(df, col("x"), col("y")).collect().head
    val n = data.size.toDouble
    val sx = data.map(_._1).sum; val sy = data.map(_._2).sum
    val vx = data.map(d => d._1 * d._1).sum - sx * sx / n
    val cxy = data.map(d => d._1 * d._2).sum - sx * sy / n
    assert(r.getDouble(1) > cxy / vx - 1e-9)
  }

  test("breusch-pagan: crafted variance split gives LM = 4, R² = 1") {
    import spark.implicits._
    // x∈{0,1}, residuals 0 at x=0 and ±1 at x=1 → u ⟂ fit, R²(u~x)=1
    val df = Seq((0L, 0.0), (0L, 0.0), (1L, 1.0), (1L, -1.0))
      .toDF("x", "y")
    val r = Regression.breuschPagan(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 4)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }

  test("chow: per-segment perfect fits leave only the pooled SSR") {
    import spark.implicits._
    // seg1 y=x on x=0..2; seg2 y=2x on x=3..5 → SSR₁=SSR₂=0 (F null),
    // pooled SSR = 83.5 − 37.5²/17.5 = 3.142857
    val df = Seq((0L, 0.0, true), (1L, 1.0, true), (2L, 2.0, true),
      (3L, 6.0, false), (4L, 8.0, false), (5L, 10.0, false))
      .toDF("x", "y", "first")
    val r = Regression.chow(df, col("x"), col("y"), col("first"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(2) - (83.5 - 37.5 * 37.5 / 17.5)) < 1e-4)
    assert(math.abs(r.getDouble(3)) < 1e-9)
    assert(r.isNullAt(4))
  }

  test("brier decomposition: a perfectly calibrated constant forecast") {
    import spark.implicits._
    // p = 0.25 for 4 rows, 1 positive: REL = 0, RES = 0,
    // UNC = 0.1875 = Brier
    val df = Seq((0.25, false), (0.25, false), (0.25, false), (0.25, true))
      .toDF("p", "y")
    val r = Evaluation.brierDecomposition(df, col("p"), col("y"))
      .collect().head
    assert(r.getLong(0) == 4)
    assert(math.abs(r.getDouble(1) - 0.1875) < 1e-9)
    assert(math.abs(r.getDouble(2)) < 1e-9)
    assert(math.abs(r.getDouble(3)) < 1e-9)
    assert(math.abs(r.getDouble(4) - 0.1875) < 1e-9)
  }

  test("brier decomposition: a sharp correct forecast is all resolution") {
    import spark.implicits._
    val df = Seq((0.0, false), (0.0, false), (1.0, true), (1.0, true))
      .toDF("p", "y")
    val r = Evaluation.brierDecomposition(df, col("p"), col("y"))
      .collect().head
    assert(math.abs(r.getDouble(1)) < 1e-9)         // brier 0
    assert(math.abs(r.getDouble(2)) < 1e-9)         // reliability 0
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-9)  // resolution = UNC
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-9)
  }

  test("hosmer-lemeshow: calibrated bin contributes 0") {
    import spark.implicits._
    val df = Seq((0.25, false), (0.25, false), (0.25, false), (0.25, true),
      (0.95, true), (0.95, true)).toDF("p", "y")
    val rows = Evaluation.hosmerLemeshow(df, col("p"), col("y")).collect()
    val b2 = rows.find(_.getLong(0) == 2).get
    assert(b2.getLong(1) == 4 && b2.getLong(2) == 1)
    assert(math.abs(b2.getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(b2.getDouble(6)) < 1e-9)
    // 0.95 bin: e1 = 1.9, o1 = 2 → contrib = .01/1.9 + .01/.1 = 0.1053
    val b9 = rows.find(_.getLong(0) == 9).get
    assert(math.abs(b9.getDouble(6) -
      (0.01 / 1.9 + 0.01 / 0.1)) < 1e-3)
  }
}
