package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.{Experiment, Trend}
import graft.text.UnigramLm

/** STL-lite decomposition (q291), Mantel-Haenszel (q292), unigram-LM
  * trainer (q293), Holt smoothing (q294). */
class StlMhUnigramSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")

  test("stl on a linear ramp: trend = y, zero seasonal and residual") {
    import spark.implicits._
    // one event per day with value t: centered 7-day MA of a line is the
    // line itself, so the detrended series — and with it the seasonal
    // component and residual — is exactly zero on interior days
    val rows = (1 to 9).map(t => (day(t), t.toDouble))
    val r = Trend.stlDecompose(rows.toDF("ts", "value"), "ts", "value", 7)
      .collect()
    assert(r.length == 3) // days 4..6 carry a full window
    r.foreach { x =>
      assert(x.getDouble(1) == x.getDouble(2)) // y == trend
      assert(x.getDouble(3) == 0.0 && x.getDouble(4) == 0.0)
    }
  }

  test("stl components re-add to y") {
    import spark.implicits._
    val rows = (1 to 21).flatMap(t =>
      Seq.fill(1 + t % 3)((day(t), (t % 5).toDouble + 0.25)))
    val r = Trend.stlDecompose(rows.toDF("ts", "value"), "ts", "value", 7)
      .collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(math.abs(x.getDouble(1) -
        (x.getDouble(2) + x.getDouble(3) + x.getDouble(4))) < 1e-9)
    }
  }

  test("mantel-haenszel single stratum reduces to the plain odds ratio") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // discover hash-arm membership first, then build a 2x2 with
    // a=2 b=1 (exposed), c=1 d=2 (unexposed): OR = (2·2/6)/(1·1/6) = 4
    val ids = (1L to 40L).toDF("id")
      .select(col("id"), (graft.operators.Sharding.hash32(col("id")) % 2 === 0)
        .as("exp"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val e = ids.filter(_._2).map(_._1).head
    val u = ids.filterNot(_._2).map(_._1).head
    val rows = Seq(
      (day(1), e, "purchase"), (day(1), e, "purchase"), (day(1), e, "view"),
      (day(1), u, "purchase"), (day(1), u, "view"), (day(1), u, "view"))
      .toDF("ts", "user_id", "event_type")
    val r = Experiment.mantelHaenszel(rows, "user_id",
      col("event_type") === "purchase", "ts").collect().head
    assert(r.getLong(0) == 1 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 4.0)
    // E = 3·3/6 = 1.5, V = 81/180 = 0.45, chi = 0.25/0.45
    assert(math.abs(r.getDouble(3) - 0.5556) < 1e-9)
  }

  test("holt on a perfect line: fitted equals y, trend equals the slope") {
    import spark.implicits._
    val rows = (1 to 5).map(t => (day(t), t.toDouble))
    val r = Trend.holtLinear(rows.toDF("ts", "value"), "ts", "value", 0.3, 0.2)
      .collect()
    assert(r.length == 4)
    r.foreach { x =>
      assert(x.getDouble(1) == x.getDouble(4)) // y == fitted
      assert(x.getDouble(1) == x.getDouble(2)) // level tracks exactly
      assert(x.getDouble(3) == 1.0)            // slope 1/day
    }
  }

  test("unigram-lm learns the repeated word as one piece") {
    import spark.implicits._
    val docs = Seq("abab abab", "abab").toDF("text")
    val r = UnigramLm.train(docs, "text", vocabSize = 16, maxPieceLen = 4,
      rounds = 2, topK = 5).collect()
    assert(r.head.getString(0) == "abab" && r.head.getLong(1) == 3)
    // nothing else carries count: the Viterbi single-piece segmentation
    // beats every split under the seed frequencies
    assert(r.drop(1).forall(_.getLong(1) == 0L))
  }

  test("unigram-lm segmentation covers every word (char floor)") {
    import spark.implicits._
    val docs = Seq("xyz qqq xyzqqq").toDF("text")
    val r = UnigramLm.train(docs, "text", vocabSize = 16, maxPieceLen = 3,
      rounds = 3, topK = 50).collect()
    // total piece-count mass equals total segmentable word mass: every
    // word contributed a full segmentation every round
    assert(r.map(_.getLong(1)).sum >= 3)
    assert(r.forall(_.getDouble(2) > 0.0))
  }
}
