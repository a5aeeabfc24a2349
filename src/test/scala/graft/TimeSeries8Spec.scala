package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.analyze.{AllenRelations, Intermittent, MatrixProfile, Trend}

/** Matrix-profile discord (q340), periodogram (q341), Croston (q342),
  * Allen relations (q343). */
class TimeSeries8Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def daySeries(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, d) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      ("s", java.sql.Timestamp.valueOf(day.atTime(12, 0)), v)
    }.toDF("g", "ts", "v")
  }

  test("periodogram concentrates power at the injected period") {
    val vals = (0 until 28).map(d =>
      100.0 + 50.0 * math.sin(2 * math.Pi * d / 7.0))
    val out = Trend.periodogram(daySeries(vals), "g", "ts", "v", 14)
      .collect()
    assert(out.length == 13)
    // periods that don't divide n leak (non-orthogonal basis) — the
    // injected period must still dominate every other candidate
    val at7 = out.find(_.getLong(1) == 7L).get.getDouble(2)
    val others = out.filter(_.getLong(1) != 7L).map(_.getDouble(2)).max
    assert(at7 > 0.5 && at7 > 2 * others,
      s"expected dominant share at p=7, got $at7 vs max-other $others")
  }

  test("matrix profile flags the corrupted stretch as the discord") {
    // weekly sawtooth for 35 days with days 14..20 replaced by a spike
    val vals = (0 until 35).map { d =>
      if (d >= 14 && d <= 20) 500.0 + d else (d % 7) * 10.0
    }.map(_.toDouble)
    val r = MatrixProfile.discord(daySeries(vals), "g", "ts", "v", 7)
      .collect().head
    val start = r.getLong(2)
    // the discord window must intersect the corrupted region
    assert(start >= 8 && start <= 20, s"discord at $start")
    assert(r.getLong(1) == 29) // 35 − 7 + 1 complete windows
  }

  test("croston matches the hand-computed split SES") {
    import spark.implicits._
    val demands = Seq(0, 2, 6, 8, 14).map(d =>
      (7L, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00"), 10.0))
    val df = demands.toDF("k", "ts", "q")
    val r = Intermittent.croston(df, col("k"), col("ts"), col("q"), 5)
      .collect().head
    assert(r.getLong(1) == 5)
    assert(math.abs(r.getDouble(2) - 10.0) < 1e-6)      // z_hat
    assert(math.abs(r.getDouble(3) - 4.25) < 1e-6)      // p_hat
    assert(math.abs(r.getDouble(4) - 10.0 / 4.25) < 1e-6)
  }

  test("allen histogram classifies crafted interval pairs") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s:00:00")
    // u1 before: views 01-02, purchases 05-06; u2 during: views 03-04
    // inside purchases 01-08; u3 equals: both 01-02
    val rows = Seq(
      (1L, t("01 10"), "view"), (1L, t("02 10"), "view"),
      (1L, t("05 10"), "purchase"), (1L, t("06 10"), "purchase"),
      (2L, t("03 10"), "view"), (2L, t("04 10"), "view"),
      (2L, t("01 10"), "purchase"), (2L, t("08 10"), "purchase"),
      (3L, t("01 10"), "view"), (3L, t("02 10"), "view"),
      (3L, t("01 10"), "purchase"), (3L, t("02 10"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = AllenRelations.histogram(rows, col("user_id"), col("ts"),
      col("event_type") === "view", col("event_type") === "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("before" -> 1L, "during" -> 1L, "equals" -> 1L))
  }
}
