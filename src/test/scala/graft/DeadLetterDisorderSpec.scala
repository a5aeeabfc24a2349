package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.DisorderAudit
import graft.operators.DeadLetter

/** Dead-letter routing + disorder audit. */
class DeadLetterDisorderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dead letter: first failing rule wins; NULL predicate fails") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0),     // clean
      (null, 5.0),   // fails r1
      (null, -1.0),  // fails r1 AND r2 → reason is r1 (order contract)
      (3L, -1.0),    // fails r2
      (4L, null)     // null value → r2 predicate NULL → fails r2
    ).toDF("id", "v")
    val rules = Seq(
      "r1_id" -> col("id").isNotNull,
      "r2_v" -> (col("v") >= 0))
    val rep = DeadLetter.report(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("ok" -> 1L, "r1_id" -> 2L, "r2_v" -> 2L))
    assert(DeadLetter.good(df, rules).count() == 1)
    assert(DeadLetter.dead(df, rules).count() == 4)
    // good + dead partition the input
    assert(DeadLetter.good(df, rules).columns.toSeq == Seq("id", "v"))
  }

  test("disorder audit: backsteps counted against the running max") {
    import spark.implicits._
    // arrival order (event_id): t=10, t=30, t=20 (10s late), t=25 (5s late)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10")),
      (1L, 2L, ts("2024-01-01 00:00:30")),
      (1L, 3L, ts("2024-01-01 00:00:20")),
      (1L, 4L, ts("2024-01-01 00:00:25"))
    ).toDF("user_id", "event_id", "ts")
    val r = DisorderAudit.report(ev, "user_id", "ts", "event_id")
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 10.0)
    // two late rows: backsteps 5s, 10s; rank ceil(3·0.99)=3 clamps to n=2 → 10s
    assert(r.getDouble(3) == 10.0)
  }

  test("disorder audit: fully ordered stream reports zeros") {
    import spark.implicits._
    val ev = (1 to 10).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 00:00:${i}%02d"))).toDF("user_id", "event_id", "ts")
    val r = DisorderAudit.report(ev, "user_id", "ts", "event_id").collect().head
    assert(r.getLong(1) == 0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }
}
