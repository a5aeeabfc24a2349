package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.{RobustStats, Survival}

/** Weibull median-rank fit (q307) and Hodges-Lehmann (q308). */
class WeibullHlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("weibull two-point fit matches the closed form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // durations 1 and 2 (n = 2): F̂ = 0.7/2.4, 1.7/2.4; x = 0, ln 2 →
    // slope k = (y2 − y1)/ln 2, scale = exp(−y1/k) (since x1 = 0)
    val rows = Seq(
      (day(1), 1L, "signup"), (day(2), 1L, "purchase"),
      (day(1), 2L, "signup"), (day(3), 2L, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val r = Survival.weibullFit(rows, "user_id", "ts",
      col("event_type") === "purchase").collect().head
    val y1 = math.log(-math.log(1.0 - 0.7 / 2.4))
    val y2 = math.log(-math.log(1.0 - 1.7 / 2.4))
    val k = (y2 - y1) / math.log(2.0)
    assert(r.getLong(0) == 2)
    assert(math.abs(r.getDouble(1) - k) < 1e-3)
    assert(math.abs(r.getDouble(2) - math.exp(-y1 / k)) < 1e-3)
  }

  test("weibull excludes censored users and zero durations") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (day(1), 1L, "signup"), (day(2), 1L, "purchase"),
      (day(1), 2L, "signup"), (day(3), 2L, "purchase"),
      (day(1), 3L, "purchase"),                 // dur 0 → excluded
      (day(1), 4L, "view"), (day(5), 4L, "view")) // censored → excluded
      .toDF("ts", "user_id", "event_type")
    val r = Survival.weibullFit(rows, "user_id", "ts",
      col("event_type") === "purchase").collect().head
    assert(r.getLong(0) == 2)
  }

  test("hodges-lehmann exact median of walsh averages") {
    import spark.implicits._
    // daily totals 1, 2, 10 → walsh averages {1,1.5,2,5.5,6,10} →
    // even count, HL = (2 + 5.5)/2 = 3.75
    val rows = Seq((day(1), 1.0), (day(2), 2.0), (day(3), 10.0))
      .toDF("ts", "value")
    val r = RobustStats.hodgesLehmann(rows, "ts", "value").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 3.75)
  }

  test("hodges-lehmann resists the outlier the mean chases") {
    import spark.implicits._
    val rows = (1 to 9).map(i => (day(i), 5.0)) :+ (day(10), 1000.0)
    val r = RobustStats.hodgesLehmann(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(r.getDouble(2) == 5.0) // the Walsh-median ignores the spike
  }

  test("l-moments of 1..5: l1 = 3, l2 = 1, symmetric taus = 0") {
    import spark.implicits._
    val r = RobustStats.lMoments(
      Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("value"), "value").collect().head
    assert(r.getLong(0) == 5)
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 1.0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("l-moments handle ties via the hockey-stick group weights") {
    import spark.implicits._
    // sorted (1,1,3): b0 = 5/3, b1 = 7/6 → l2 = 2/3
    val r = RobustStats.lMoments(
      Seq(1.0, 1.0, 3.0).toDF("value"), "value").collect().head
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-6)
  }
}
