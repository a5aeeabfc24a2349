package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.analyze.Agreement

/** Fleiss' kappa (q322), one-way ICC (q323), Lin's CCC (q324). */
class AgreementSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("fleiss kappa: perfect agreement is 1") {
    import spark.implicits._
    val df = Seq((1L, "x", "x"), (2L, "y", "y"), (3L, "x", "x"))
      .toDF("id", "r1", "r2")
    val r = Agreement.fleissKappa(df, col("id"), Seq(col("r1"), col("r2")))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-9)
  }

  test("fleiss kappa matches the hand-computed mixed case") {
    import spark.implicits._
    // 4 subjects × 2 raters: agree, agree, disagree, disagree →
    // P̄ = (1+1+0+0)/4 = 0.5; totals x:4 y:4 → P_e = (16+16)/64 = 0.5 →
    // κ = (0.5−0.5)/0.5 = 0
    val df = Seq((1L, "x", "x"), (2L, "y", "y"), (3L, "x", "y"),
      (4L, "y", "x")).toDF("id", "r1", "r2")
    val r = Agreement.fleissKappa(df, col("id"), Seq(col("r1"), col("r2")))
      .collect().head
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(5)) < 1e-9)
  }

  test("icc(1,1) hand case: separated groups give 0.777778") {
    import spark.implicits._
    // g1={1,2}, g2={3,4}: SSB=4, SSW=1, MSB=4, MSW=0.5, k0=2 →
    // ICC = 3.5/4.5 = 0.777778
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 3.0), ("g2", 4.0))
      .toDF("g", "v")
    val r = Agreement.icc(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-6)
    assert(math.abs(r.getDouble(4) - 3.5 / 4.5) < 1e-6)
  }

  test("icc near zero when group means coincide") {
    import spark.implicits._
    val df = Seq(("g1", 1.0), ("g1", 3.0), ("g2", 3.0), ("g2", 1.0))
      .toDF("g", "v")
    val r = Agreement.icc(df, col("g"), col("v")).collect().head
    // MSB = 0, MSW = 2 → ICC = −2/2 = −1 (the one-way floor for k0=2)
    assert(math.abs(r.getDouble(2)) < 1e-9)
    assert(math.abs(r.getDouble(4) - (-1.0)) < 1e-6)
  }

  test("lin ccc: identity is 1; constant shift degrades it, r stays 1") {
    import spark.implicits._
    val id = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r1 = Agreement.linCcc(id, col("x"), col("y")).collect().head
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-9)
    // y = x+1: vx=vy=2, cxy=2, (x̄−ȳ)²·n = 3 → CCC = 4/7, r = 1, c_b = 4/7
    val sh = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val r2 = Agreement.linCcc(sh, col("x"), col("y")).collect().head
    assert(math.abs(r2.getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(r2.getDouble(2) - 4.0 / 7.0) < 1e-6)
    assert(math.abs(r2.getDouble(3) - 4.0 / 7.0) < 1e-6)
  }
}
