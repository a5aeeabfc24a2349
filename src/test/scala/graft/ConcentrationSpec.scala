package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Concentration

/** Benford + Gini forensics. */
class ConcentrationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("benfordReport takes the first digit of the quantized value") {
    import spark.implicits._
    // 0.0000015 quantizes to 2 (round half up at 6 dp) → digit 2;
    // 923.4 → 923400000 → digit 9; 0.25 → 250000 → digit 2
    val df = Seq(0.0000015, 923.4, 0.25, -5.0, 0.0).toDF("v")
    val got = Concentration.benfordReport(df, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(2L -> 2L, 9L -> 1L)) // negatives and zero excluded
  }

  test("benfordReport shares sum to 1 and carry the Benford expectation") {
    import spark.implicits._
    val df = (1 to 100).map(i => i.toDouble).toDF("v")
    val rows = Concentration.benfordReport(df, "v").collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    val d1 = rows.find(_.getLong(0) == 1L).get
    assert(d1.getDouble(3) == 0.30103)
  }

  test("gini: equal values → 0; single concentrated row → (n-1)/n") {
    import spark.implicits._
    val eq = (1 to 10).map(i => ("a", i.toLong, 5.0)).toDF("g", "id", "v")
    val g1 = Concentration.gini(eq, "g", "v", "id").collect().head
    assert(g1.getDouble(2) == 0.0)
    // all mass on one of 10 rows: Gini = (n-1)/n = 0.9 exactly
    val conc = (("a", 0L, 100.0) +: (1 to 9).map(i => ("a", i.toLong, 0.0)))
      .toDF("g", "id", "v")
    val g2 = Concentration.gini(conc, "g", "v", "id").collect().head
    assert(g2.getDouble(2) == 0.9)
  }

  test("gini matches the brute pairwise-difference definition") {
    import spark.implicits._
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("g", "id", "v")
    val got = Concentration.gini(df, "g", "v", "id").collect().head.getDouble(2)
    // G = Σ_i Σ_j |x_i − x_j| / (2 n² μ)... rank form equals n-normalized
    // variant G = Σ|xi−xj| / (2 n Σx) — compute both-brute and compare
    val n = vals.size
    val brute = (for (a <- vals; b <- vals) yield math.abs(a - b)).sum /
      (2.0 * n * vals.sum)
    assert(math.abs(got - brute) < 1e-4)
  }
}
