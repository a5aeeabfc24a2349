package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Growth

/** Growth accounting + RFM segmentation. */
class GrowthSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("daily accounting: new vs returning and the cumulative curve") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")), (3L, ts("2024-01-02 11:00:00")),
      (1L, ts("2024-01-02 12:00:00")) // same user same day: one active row
    ).toDF("user_id", "ts")
    val got = Growth.dailyAccounting(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((2L, 2L, 0L, 2L), (2L, 1L, 1L, 3L)))
  }

  test("RFM buckets partition users evenly under the exact rank rule") {
    import spark.implicits._
    val ev = (0 until 25).map { u =>
      (u.toLong, ts(f"2024-01-${u % 20 + 1}%02d 00:00:00"), "purchase",
        (u * 3 % 17) + 1.0)
    }.toDF("user_id", "ts", "event_type", "value")
    val segs = Growth.rfmSegments(ev, "user_id", "ts", "value",
      col("event_type") === "purchase").collect()
    assert(segs.map(_.getLong(3)).sum == 25)
    // each axis puts exactly 5 of 25 users in each quintile
    val byR = segs.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byR.toMap == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 5L))
  }

  test("RFM puts the clear whale in the top monetary bucket") {
    import spark.implicits._
    val ev = ((1 to 24).map(u => (u.toLong, ts("2024-01-01 00:00:00"),
        "purchase", 1.0)) :+
      (99L, ts("2024-01-01 00:00:00"), "purchase", 100000.0))
      .toDF("user_id", "ts", "event_type", "value")
    val segs = Growth.rfmSegments(ev, "user_id", "ts", "value",
        col("event_type") === "purchase")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // the whale is alone in m=5's top slot count-wise: bucket 5 has 5 users,
    // but the whale must be in bucket 5 (rank 25 → (24*5) div 25 = 4 → +1)
    assert(segs.filter(_._1 == 5L).map(_._2).sum == 5L)
  }
}
