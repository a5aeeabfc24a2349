package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.{Contingency, Experiment, Outliers, Trend}

/** Cochran's Q (q298), McNemar (q299), runs test (q300), Grubbs (q301),
  * Cronbach's alpha (q302). */
class PairedTestsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("cochran q hand case") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // u1:{t1} u2:{t1,t2} u3:{t1} → C=(3,1) N=4 R=(1,2,1)
    // Q = 1·(2·10 − 16)/(2·4 − 6) = 2.0
    val rows = Seq((1L, "t1"), (2L, "t1"), (2L, "t2"), (3L, "t1"))
    val r = Contingency.cochranQ(rows.toDF("u", "t"), col("u"), col("t"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 2.0)
  }

  test("mcnemar counts discordant pairs across the midpoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // window days 1..4, midpoint day 2 (floor(3/2)=1): first half ≤ day2
    // u1,u2,u3 purchase only early (b), u4 only late (c) → chi=(3−1)²/4=1
    val rows = Seq(
      (day(1), 1L, "purchase"), (day(4), 1L, "view"),
      (day(2), 2L, "purchase"), (day(4), 2L, "view"),
      (day(1), 3L, "purchase"), (day(3), 3L, "view"),
      (day(1), 4L, "view"), (day(4), 4L, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val r = Contingency.mcnemar(rows, col("user_id"), col("ts"),
      col("event_type") === "purchase").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 1.0)
  }

  test("runs test on a streaky series") {
    import spark.implicits._
    // daily totals 1,2,3,2,1,2 → signs ++−−+ → 3 runs, n+=3 n−=2
    // E = 2·6/5 + 1 = 3.4, V = 2.4·1.4/4 = 0.84
    val rows = Seq(1, 2, 3, 2, 1, 2).zipWithIndex
      .map { case (v, i) => (day(i + 1), v.toDouble) }
    val r = Trend.runsTest(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(math.abs(r.getDouble(3) - (3 - 3.4) / math.sqrt(0.84)) < 1e-4)
  }

  test("grubbs statistic for a planted extreme") {
    import spark.implicits._
    // 1,2,3,10: mean 4, s² = 50/3 → G = 6/√(50/3)
    val r = Outliers.grubbs(Seq(1.0, 2.0, 3.0, 10.0).toDF("value"), "value")
      .collect().head
    assert(r.getLong(0) == 4 && r.getDouble(1) == 1.0 && r.getDouble(2) == 10.0)
    assert(math.abs(r.getDouble(3) - 6.0 / math.sqrt(50.0 / 3)) < 1e-4)
  }

  test("cronbach alpha: proportional items are perfectly consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // u1: t1×2 t2×2, u2: t1×1 t2×1 → per-item n²σ² = 1 each, total 4
    // α = 2·(1 − 2/4) = 1.0
    val rows = Seq((1L, "t1"), (1L, "t1"), (1L, "t2"), (1L, "t2"),
      (2L, "t1"), (2L, "t2"))
    val r = Experiment.cronbachAlpha(rows.toDF("u", "t"), col("u"), col("t"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0)
  }

  test("cronbach alpha: an inconsistent item drags alpha to zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // u1: t1×2 t2×1, u2: t2×1 → svj = 4, vt = 4 → α = 2·(1 − 1) = 0
    val rows = Seq((1L, "t1"), (1L, "t1"), (1L, "t2"), (2L, "t2"))
    val r = Experiment.cronbachAlpha(rows.toDF("u", "t"), col("u"), col("t"))
      .collect().head
    assert(r.getDouble(2) == 0.0)
  }

  test("negative-binomial moment fit on overdispersed counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // per-user counts {1,1,1,9}: m = 3, s² = 16 → dispersion 16/3,
    // r = 9/13, p = 3/16
    val df = (Seq((1L, 0), (2L, 0), (3L, 0)) ++ (1 to 9).map(_ => (4L, 0)))
      .toDF("u", "z")
    val r = graft.analyze.RobustStats.negBinFit(df, col("u")).collect().head
    assert(r.getLong(0) == 4 && r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 16.0 / 3) < 1e-4)
    assert(math.abs(r.getDouble(3) - 9.0 / 13) < 1e-6)
    assert(r.getDouble(4) == 0.1875)
  }

  test("negative-binomial fit is null for under-dispersed counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // all users identical (v = 0 < m): no NB fit, dispersion 0
    val df = (1L to 4L).flatMap(u => Seq((u, 0), (u, 0))).toDF("u", "z")
    val r = graft.analyze.RobustStats.negBinFit(df, col("u")).collect().head
    assert(r.getDouble(2) == 0.0 && r.isNullAt(3) && r.isNullAt(4))
  }
}
