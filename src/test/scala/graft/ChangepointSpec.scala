package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Changepoint

/** Single-breakpoint changepoint detection. */
class ChangepointSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("a clean level shift is found at the exact day") {
    import spark.implicits._
    // 10 days at 10.0, then 10 days at 50.0 → break at day 11
    val rows = (0 until 20).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d < 10) 10.0 else 50.0)
    }
    val r = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getTimestamp(1).toString.startsWith("2024-01-11"))
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 50.0)
    assert(r.getDouble(4) == 0.0) // piecewise-constant fit is exact
  }

  test("noisy shift still localizes; SSE beats every other split") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        (if (d < 12) 20.0 else 80.0) + rnd.nextInt(5))
    }
    val r = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getTimestamp(1).toString.startsWith("2024-01-13"))
    assert(r.getDouble(2) < 30 && r.getDouble(3) > 70)
  }

  test("single-day keys are dropped, multi-key frames stay independent") {
    import spark.implicits._
    val rows = Seq(
      ("solo", ts("2024-01-01 00:00:00"), 1.0),
      ("pair", ts("2024-01-01 00:00:00"), 1.0),
      ("pair", ts("2024-01-02 00:00:00"), 9.0))
    val got = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect()
    assert(got.map(_.getString(0)).toSeq == Seq("pair"))
    assert(got.head.getDouble(2) == 1.0 && got.head.getDouble(3) == 9.0)
  }
}
