package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Concentration, Multiplicity, RankStats}
import graft.ml.Evaluation

/** Average precision, Kendall tau-b, BH-FDR, Theil index (q239–q242). */
class MultiplicityEvalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("averagePrecision: textbook 4-row case and the perfect ranking") {
    import spark.implicits._
    // scores desc: 0.9(+), 0.8(−), 0.7(+), 0.6(−) →
    // AP = (1/2)(1/1) + (1/2)(2/3) = 0.833333
    val df = Seq((0.9, true), (0.8, false), (0.7, true), (0.6, false))
      .toDF("s", "y")
    val r = Evaluation.averagePrecision(df, col("s"), col("y")).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 0.833333) < 1e-9)
    // every positive above every negative → AP = 1
    val perfect = (0 until 100).map(i => (1.0 - i / 1000.0, i < 30)).toDF("s", "y")
    val rp = Evaluation.averagePrecision(perfect, col("s"), col("y"))
      .collect().head
    assert(rp.getDouble(2) == 1.0)
  }

  test("averagePrecision: no positives gives NULL, ties fold into one block") {
    import spark.implicits._
    val none = Seq((0.5, false), (0.2, false)).toDF("s", "y")
    assert(Evaluation.averagePrecision(none, col("s"), col("y"))
      .collect().head.isNullAt(2))
    // one tied block (2 of 4 positive): AP = (2/2)·(2/4) = 0.5 regardless
    // of within-block order
    val tied = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "y")
    assert(Evaluation.averagePrecision(tied, col("s"), col("y"))
      .collect().head.getDouble(2) == 0.5)
  }

  test("kendallTau: perfect monotone daily series gives tau = ±1") {
    import spark.implicits._
    val up = (0 until 20).map(i =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 10:00:00"),
        (i + 1).toDouble))
    val down = (0 until 20).map(i =>
      ("b", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 10:00:00"),
        (20 - i).toDouble))
    val df = (up ++ down).toDF("g", "ts", "v")
    val r = RankStats.kendallTau(df, "g", "ts", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(r("a") == 1.0 && r("b") == -1.0)
  }

  test("kendallTau: tie correction matches the hand-computed tau-b") {
    import spark.implicits._
    // daily totals 1, 2, 2, 3: C = 5, D = 0, ties ty = 1, n0 = 6 →
    // tau_b = 5 / sqrt(6·5) = 0.912871
    val df = Seq(1.0, 2.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 10:00:00"), v)
    }.toDF("g", "ts", "v")
    val r = RankStats.kendallTau(df, "g", "ts", "v").collect().head
    assert(r.getLong(2) == 5 && r.getLong(3) == 0)
    assert(math.abs(r.getDouble(4) - 5.0 / math.sqrt(30.0)) < 1e-6)
  }

  test("welchByGroupBH: planted shift rejected, flat group not, " +
    "zero-variance group carries NULL p") {
    import spark.implicits._
    val arm = graft.operators.Sharding.hash32(col("uid")) % 2 === 0
    val base = (0 until 2000).map(i => (i.toLong, i % 7)).toDF("uid", "jit")
    val shifted = base.select(lit("shift").as("g"), col("uid"),
      (when(arm, 100.0).otherwise(0.0) + col("jit")).as("v"))
    val flat = base.select(lit("flat").as("g"), col("uid"),
      col("jit").cast("double").as("v"))
    val const = base.select(lit("const").as("g"), col("uid"),
      lit(5.0).as("v"))
    val out = Multiplicity
      .welchByGroupBH(shifted.union(flat).union(const), "g", "uid", "v")
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(4)) None else Some(r.getDouble(4))), r.getLong(6)))
      .toMap
    assert(out("shift")._1.get < 1e-6 && out("shift")._2 == 1L)
    assert(out("flat")._1.get > 0.05 && out("flat")._2 == 0L)
    assert(out("const")._1.isEmpty && out("const")._2 == 0L)
  }

  test("theilIndex: equal rows give 0, the 2-row hand case matches") {
    import spark.implicits._
    val eq = (0 until 10).map(i => ("a", 7.0)).toDF("g", "v")
    assert(Concentration.theilIndex(eq, "g", "v")
      .collect().head.getDouble(2) == 0.0)
    // x = {1, 3}: T = (0.5·ln 0.5 + 1.5·ln 1.5) / 2 = 0.130812
    val two = Seq(("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val t = Concentration.theilIndex(two, "g", "v").collect().head.getDouble(2)
    assert(math.abs(t - (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2) < 1e-6)
  }
}
