package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Attribution

/** Exact 3-channel Shapley attribution (q276). */
class ShapleySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type")
    Attribution.shapley3(df, "user_id",
      col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C", col("event_type") === "buy")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric single-channel converters split credit equally") {
    // one converter touched only A, one only B, one only C
    val rows = Seq((1L, "A"), (1L, "buy"), (2L, "B"), (2L, "buy"),
      (3L, "C"), (3L, "buy"))
    val s = run(rows)
    assert(s("A") == 1.0 && s("B") == 1.0 && s("C") == 1.0)
  }

  test("efficiency axiom: credits sum to the conversions attributable beyond v(∅)") {
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "buy"),
      (2L, "A"), (2L, "buy"),
      (3L, "C"), (3L, "buy"),
      (4L, "A"), (4L, "B"), (4L, "C"), (4L, "buy"),
      (5L, "buy")) // zero-touch converter = v(∅)
    val s = run(rows)
    // v(∅) = 1 (user 5), v(ABC) = 5 → Σ shapley = 4
    assert(math.abs(s.values.sum - 4.0) < 2e-6) // 6-dp rounding of thirds
    // A carries more coalitions than C (users 1, 2, 4 vs 3, 4)
    assert(s("A") > s("C"))
  }

  test("a channel no converter touched gets zero") {
    val rows = Seq((1L, "A"), (1L, "buy"), (2L, "A"), (2L, "buy"),
      (9L, "B")) // B touched only by a non-converter
    val s = run(rows)
    assert(s("B") == 0.0 && s("C") == 0.0 && s("A") == 2.0)
  }
}
