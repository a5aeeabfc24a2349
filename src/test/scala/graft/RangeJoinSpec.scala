package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned keyed range join: brute-force equivalence on random data
  * (including exact-boundary and duplicate timestamps), zero-match
  * retention, and the plan guard that makes it scale — the range predicate
  * must ride an EQUI join on (key, bin), never a nested-loop/cartesian. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("trailingAgg equals the brute-force window scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val w = 100L // seconds
    // dense collisions: few keys, timestamps clustered so windows overlap,
    // exact-boundary hits (multiples of w) included
    val rows = (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(500).toLong * 10L, rnd.nextInt(100).toLong) }
    val df = rows.toDF("id", "k", "sec", "v")
      .select($"id", $"k", timestamp_seconds($"sec").as("ts"), $"v".cast("double").as("v"))
    val got = RangeJoin.trailingAgg(df, df, "k", "ts", "id", "v", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.size == rows.size)
    rows.foreach { case (id, k, sec, _) =>
      val inWin = rows.filter(o =>
        o._2 == k && o._3 >= sec - w && o._3 < sec)
      val expectN = inWin.size.toLong
      val expectSum = if (inWin.isEmpty) None else Some(inWin.map(_._4.toDouble).sum)
      assert(got(id) == ((expectN, expectSum)),
        s"id $id: expected ($expectN, $expectSum) got ${got(id)}")
    }
  }

  test("range join plan is an equi join on (key, bin) — no nested loop") {
    import spark.implicits._
    val df = Seq((1L, 1L, 10L, 1.0)).toDF("id", "k", "sec", "v")
      .select($"id", $"k", timestamp_seconds($"sec").as("ts"), $"v")
    val plan = RangeJoin.trailingAgg(df, df, "k", "ts", "id", "v", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi physical join:\n$plan")
  }
}
