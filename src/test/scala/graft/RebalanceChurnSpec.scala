package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.ChurnLabels
import graft.operators.Rebalance

/** Mix rebalancing, token budgets, churn labels. */
class RebalanceChurnSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("toTargetMix hits the exact target shares, bound by the scarce group") {
    import spark.implicits._
    // a: 100 rows, b: 10 rows; target 50/50 → b binds: M=20, keep 10+10
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (101 to 110).map(i => ("b", i.toLong))).toDF("g", "id")
    val kept = Rebalance.toTargetMix(df, "g", "id",
        Map("a" -> 0.5, "b" -> 0.5))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("a" -> 10L, "b" -> 10L))
  }

  test("toTargetMix selection is the portable hash rank (stable rerun)") {
    import spark.implicits._
    val df = (1 to 60).map(i => ("x", i.toLong)).toDF("g", "id")
      .unionAll((1 to 30).map(i => ("y", i + 100L)).map(t => t).toDF("g", "id"))
    def run() = Rebalance.toTargetMix(df, "g", "id",
        Map("x" -> 0.6, "y" -> 0.4))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(run() == run())
  }

  test("tokenBudgetTrim keeps the greedy prefix and cuts the overflow doc") {
    import spark.implicits._
    // scores force order d1 > d2 > d3; tokens 5,4,3; budget 9 → keep d1,d2
    val df = Seq((1L, 3.0, 5L), (2L, 2.0, 4L), (3L, 1.0, 3L))
      .toDF("id", "score", "toks")
    val kept = Rebalance.tokenBudgetTrim(df, "id", "score", "toks", 9L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("tokenBudgetTrim equals a single-machine greedy reference at size") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (i.toLong, ((i * 37) % 101).toDouble, ((i * 13) % 40) + 1L)
    }
    val df = rows.toDF("id", "score", "toks").repartition(13)
    val got = Rebalance.tokenBudgetTrim(df, "id", "score", "toks", 3000L)
      .select("id").collect().map(_.getLong(0)).toSet
    val ref = {
      var cum = 0L
      rows.sortBy { case (id, s, _) => (-s, id) }.takeWhile { case (_, _, t) =>
        cum += t; cum <= 3000L
      }.map(_._1).toSet
    }
    assert(got == ref)
  }

  test("churn labels: silent-next-week is churn, horizon week is censored") {
    import spark.implicits._
    val ev = Seq(
      // user 1: weeks of Jan 1, Jan 8 (consecutive), then gone
      (1L, ts("2024-01-02 00:00:00")), (1L, ts("2024-01-09 00:00:00")),
      // user 2: week Jan 1, gap, week Jan 15 (horizon)
      (2L, ts("2024-01-03 00:00:00")), (2L, ts("2024-01-16 00:00:00"))
    ).toDF("user_id", "ts")
    val got = ChurnLabels.weekly(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10),
        r.getBoolean(3))).toSeq
    // horizon = Jan 15 week: user1's Jan 8 row is labeled (next null →
    // churned), user2's Jan 1 row churned (8-day gap); horizon rows absent
    assert(got == Seq(
      (1L, "2024-01-01", false), (1L, "2024-01-08", true),
      (2L, "2024-01-01", true)))
  }
}
