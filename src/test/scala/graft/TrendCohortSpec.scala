package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{Cohort, Trend}
import graft.operators.JoinStats

/** Round-7 batch-6 additions: trend lines, autocorrelation, cohort LTV,
  * join-size estimation. */
class TrendCohortSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // --------------------------------------------------------------- trend

  test("trendLines recovers an exact linear slope") {
    import spark.implicits._
    // y = 2·(hours since start) + 5 → slope 48/day
    val rows = (0 until 24).map { h =>
      ("g", ts(f"2024-01-01 $h%02d:00:00"), 2.0 * h + 5.0)
    }
    val got = Trend.trendLines(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(got.getLong(1) == 24)
    assert(math.abs(got.getDouble(2) - 48.0) < 1e-6)
    val meanRef = rows.map(_._3).sum / 24.0
    assert(math.abs(got.getDouble(3) - meanRef) < 1e-6)
  }

  test("trendLines: constant time (zero variance) yields a null slope") {
    import spark.implicits._
    val df = Seq(("g", ts("2024-01-01 00:00:00"), 1.0),
      ("g", ts("2024-01-01 00:00:00"), 3.0)).toDF("g", "ts", "v")
    val got = Trend.trendLines(df, "g", "ts", "v").collect().head
    assert(got.isNullAt(2))
    assert(got.getDouble(3) == 2.0)
  }

  test("lagAutocorr: alternating daily totals give strong negative autocorr") {
    import spark.implicits._
    val rows = (0 until 20).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d % 2 == 0) 10.0 else 1.0)
    }
    val got = Trend.lagAutocorr(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(got.getLong(1) == 19)
    assert(got.getDouble(2) < -0.9)
  }

  test("dispersionIndex: constant daily counts 0, bursty >> 1") {
    import spark.implicits._
    // "flat": 4 events every day for 10 days → var 0 → dispersion 0
    // "burst": 1 event on 9 days, 31 on one day → heavily overdispersed
    val rows =
      (0 until 10).flatMap(d => (1 to 4).map(i =>
        ("flat", ts(f"2024-01-${d + 1}%02d 0$i:00:00")))) ++
      (0 until 9).map(d => ("burst", ts(f"2024-01-${d + 1}%02d 12:00:00"))) ++
      (1 to 31).map(i => ("burst", ts(f"2024-01-10 ${i % 24}%02d:30:00")))
    val got = Trend.dispersionIndex(rows.toDF("g", "ts"), "g", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("flat").getAs[Double]("dispersion") == 0.0)
    assert(got("flat").getAs[Double]("mean_daily") == 4.0)
    // burst: mean 4, pop var = (9*(1-4)^2 + (31-4)^2)/10 = 81 → D = 20.25
    assert(got("burst").getAs[Double]("dispersion") == 20.25)
  }

  test("lagAutocorr: constant series has undefined (null) autocorr") {
    import spark.implicits._
    val rows = (0 until 5).map(d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"), 7.0))
    val got = Trend.lagAutocorr(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(got.isNullAt(2))
  }

  // -------------------------------------------------------------- cohort

  test("ltvCurve accumulates revenue into cohort week indices") {
    import spark.implicits._
    val ev = Seq(
      // user 1 acquired Mon 2024-01-01 week; buys wk0 and wk2
      (1L, ts("2024-01-02 00:00:00"), "view", 0.0),
      (1L, ts("2024-01-03 00:00:00"), "purchase", 10.0),
      (1L, ts("2024-01-16 00:00:00"), "purchase", 5.0),
      // user 2 acquired next week; buys wk1
      (2L, ts("2024-01-08 00:00:00"), "view", 0.0),
      (2L, ts("2024-01-18 00:00:00"), "purchase", 7.5)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Cohort.ltvCurve(ev, "user_id", "ts", "value",
        col("event_type") === "purchase")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 10.0, 10.0),
      ("2024-01-01", 2L, 5.0, 15.0),
      ("2024-01-08", 1L, 7.5, 7.5)))
  }

  // ------------------------------------------------------------ joinsize

  test("innerJoinSize predicts the exact join cardinality") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 1L, 2L, 9L).toDF("j")
    val got = JoinStats.innerJoinSize(l, r, "k", "j").collect().head
    assert(got.getLong(0) == 5 && got.getLong(1) == 4)
    assert(got.getLong(2) == 2)  // keys 1, 2 matched
    assert(got.getLong(3) == 1)  // key 3 left-only
    assert(got.getLong(4) == 1)  // key 9 right-only
    val est = got.getLong(5)
    val actual = l.join(r, col("k") === col("j")).count()
    assert(est == actual && actual == 7)
    assert(got.getLong(6) == 6)  // key 1 contributes 3·2
  }
}
