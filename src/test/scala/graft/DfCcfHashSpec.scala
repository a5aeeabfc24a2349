package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.Trend
import graft.text.FeatureHashing

/** Dickey-Fuller (q311), cross-correlation (q312), hashing audit (q313). */
class DfCcfHashSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("dickey-fuller: oscillating level reads strongly mean-reverting") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 1.0, 3.0, 1.0, 2.5, 1.0, 3.5)
    val rows = vals.zipWithIndex.map { case (v, i) => (day(i + 1), v) }
    val r = Trend.dickeyFuller(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(r.getLong(0) == 7)
    assert(r.getDouble(1) < -0.8)            // strong pull-back
    assert(r.isNullAt(2) || r.getDouble(2) < 0)
  }

  test("dickey-fuller: a steady trend has near-zero beta") {
    import spark.implicits._
    val rows = (1 to 10).map(i => (day(i), i.toDouble + (i % 2) * 0.01))
    val r = Trend.dickeyFuller(rows.toDF("ts", "value"), "ts", "value")
      .collect().head
    assert(math.abs(r.getDouble(1)) < 0.3)
  }

  test("ccf peaks at the constructed lead lag") {
    import spark.implicits._
    // y_t = x_{t-1} exactly → corr(x_t, y_{t+1}) = 1
    val counts = Seq(1, 3, 2, 5, 4, 2, 6, 3)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      val prev = if (i == 0) 1.0 else counts(i - 1).toDouble
      (1 to c).map(_ => (day(i + 1), prev / c))
    }
    val r = Trend.crossCorrelation(rows.toDF("ts", "value"), "ts", "value", 3)
      .collect().map(x => x.getInt(0) -> x.getDouble(2)).toMap
    assert(r(1) == 1.0)
    assert(r.keys.toSeq.sorted == (-3 to 3).toSeq)
  }

  test("hashing audit pigeonholes three tokens into two buckets") {
    import spark.implicits._
    val docs = Seq("alpha beta gamma alpha").toDF("text")
    val r = FeatureHashing.collisionReport(docs, "text", 2).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 4)
    assert(r.getLong(2) <= 2 && r.getLong(4) >= 2)
    // colliding occurrence fraction consistent with colliding tokens
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("control chart flags the planted spike day") {
    import spark.implicits._
    // 20 calm days of values around 10, one day at 50: that day's
    // subgroup mean blows past grand_mean + 3·sigma/sqrt(n)
    val rows = (1 to 20).flatMap(d =>
      (1 to 10).map(i => (day(d), 10.0 + (i % 3)))) ++
      (1 to 10).map(i => (day(21), 50.0 + (i % 3)))
    val r = graft.analyze.Trend.controlChart(
      rows.toSeq.toDF("ts", "value"), "ts", "value").collect().head
    assert(r.getLong(0) == 21)
    assert(r.getLong(4) >= 1)
    assert(r.getDate(5).toString == "2024-01-21")
  }

  test("control chart reports zero violations on a calm series") {
    import spark.implicits._
    val rows = (1 to 15).flatMap(d =>
      (1 to 8).map(i => (day(d), 10.0 + ((d + i) % 4))))
    val r = graft.analyze.Trend.controlChart(
      rows.toSeq.toDF("ts", "value"), "ts", "value").collect().head
    assert(r.getLong(4) == 0 && r.isNullAt(5))
  }
}
