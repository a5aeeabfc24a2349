package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.RankStats

/** Mann-Whitney + Spearman rank machinery. */
class RankStatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("Mann-Whitney U matches the textbook hand case with ties") {
    import spark.implicits._
    // sample1 = {1, 2, 2}, sample2 = {2, 3}: ranks (avg) 1, 3, 3, 3, 5
    // R1 = 1 + 3 + 3 = 7; U1 = 7 − 3·4/2 = 1
    val df = Seq((1L, 1.0, true), (2L, 2.0, true), (3L, 2.0, true),
      (4L, 2.0, false), (5L, 3.0, false)).toDF("id", "v", "s")
    val r = RankStats.mannWhitney(df, "v", col("s")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0)
  }

  test("Mann-Whitney: identical distributions give U ≈ n1·n2/2 and z ≈ 0") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, ((i / 2) % 10).toDouble,
      i % 2 == 0)).toDF("id", "v", "s")
    val r = RankStats.mannWhitney(df, "v", col("s")).collect().head
    assert(r.getDouble(2) == 100.0 * 100.0 / 2.0)
    assert(math.abs(r.getDouble(3)) < 1e-9)
  }

  test("Spearman: a perfect monotone (nonlinear) relation gives rho = 1") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toDouble, math.pow(i.toDouble, 3) / 1000.0))
      .toDF("x", "y")
    val r = RankStats.spearman(df, col("x"), col("y")).collect().head
    assert(r.getDouble(1) == 1.0)
    val rInv = RankStats.spearman(df, col("x"), -col("y")).collect().head
    assert(rInv.getDouble(1) == -1.0)
  }
}
