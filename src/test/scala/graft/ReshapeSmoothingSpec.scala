package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{Attribution, CrossVal, Smoothing}
import graft.operators.Reshape
import graft.text.Readability

/** Round-7 batch-2 additions: melt/unpivot, k-fold CV, dyadic EWMA,
  * touch attribution, readability — each pinned against an independent
  * in-test reimplementation. */
class ReshapeSmoothingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def refHash32(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------- reshape

  test("melt produces rows × measures long form; summary is exact") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 30.0), (2L, 4.5, 10.0)).toDF("id", "a", "b")
    val long = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    assert(long.count() == 4)
    assert(long.columns.toSeq == Seq("id", "variable", "value"))
    val sm = Reshape.meltSummary(df, Seq("id"), Seq("a", "b"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(sm.toSeq == Seq(("a", 2L, 6.5, 2.0, 4.5), ("b", 2L, 40.0, 10.0, 30.0)))
  }

  // --------------------------------------------------------------- kfold

  test("k-fold assignment is the portable hash; folds partition the data") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"d$i", i * 2.0))
      .toDF("doc_id", "t", "v")
    val folded = CrossVal.assignFolds(docs, "doc_id", 5)
    val got = folded.select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 200L).foreach { i =>
      assert(got(i) == refHash32(i.toString) % 5, s"doc $i")
    }
    // train(i) ∪ test(i) = all, disjoint
    val train = CrossVal.trainFold(docs, "doc_id", 5, 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val test2 = CrossVal.testFold(docs, "doc_id", 5, 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(train.intersect(test2).isEmpty)
    assert(train.union(test2) == (0L until 200L).toSet)
  }

  // ---------------------------------------------------------------- ewma

  test("dyadic EWMA matches an independent integer-weight reference") {
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      (1L, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong, (i * 7 % 13) + 0.25)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val got = Smoothing.ewmaDyadic(df, "user_id", "ts", "event_id", "value")
      .orderBy("event_id").select("ewma").collect().map(_.getDouble(0))
    val vq = rows.map(r => math.round(r._4 * 1e6))
    val ref = rows.indices.map { t =>
      val lo = math.max(0, t - 10)
      val terms = (lo to t).map(i => vq(i) * (1L << (10 - (t - i))))
      val wtot = (lo to t).map(i => 1L << (10 - (t - i))).sum
      math.rint(terms.sum.toDouble / wtot.toDouble / 1e6 * 1e4) / 1e4
    }
    got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
      assert(math.abs(g - r) < 1e-9, s"row $i: $g vs $r")
    }
  }

  test("dyadic EWMA: first row is the value itself; keys are independent") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 100.0),
      (2L, ts("2024-01-01 00:00:00"), 2L, 7.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Smoothing.ewmaDyadic(df, "user_id", "ts", "event_id", "value")
      .orderBy("user_id").select("ewma").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(100.0, 7.5))
  }

  // --------------------------------------------------------- attribution

  test("touch attribution credits first and last pre-conversion touches") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view → click → purchase → view(after, ignored)
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "purchase"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "view"),
      // user 2: single click then purchase — first == last
      (2L, ts("2024-01-01 00:00:00"), 5L, "click"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "purchase"),
      // user 3: no purchase — contributes nothing
      (3L, ts("2024-01-01 00:00:00"), 7L, "view"),
      // user 4: purchase with no prior touch — contributes nothing
      (4L, ts("2024-01-01 00:00:00"), 8L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Attribution.touchReport(ev, "user_id", "ts", "event_id",
        "event_type", col("event_type") === "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", 1L, 2L), ("view", 1L, 0L)))
  }

  test("attribution pins timestamp ties by the tie column") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, t0, 1L, "view"), (1L, t0, 2L, "click"),
      (1L, ts("2024-01-01 00:01:00"), 3L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Attribution.touchReport(ev, "user_id", "ts", "event_id",
        "event_type", col("event_type") === "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // event_id 1 (view) is first, event_id 2 (click) is last
    assert(got == Seq(("click", 0L, 1L), ("view", 1L, 0L)))
  }

  // --------------------------------------------------------- readability

  test("readability counts and Flesch formula match hand computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat. the dog ran!"), // 6 words, syllables ≥ words → 6
      (2L, "zzz qqq")                    // vowel-free: syllables floored at words
    ).toDF("doc_id", "text")
    val got = Readability.report(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getLong(1) == 6 && r1.getLong(3) == 2)
    val fl1 = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (r1.getLong(2).toDouble / 6.0)
    assert(math.abs(r1.getDouble(4) - math.rint(fl1 * 1e4) / 1e4) < 1e-9)
    val r2 = got(1)
    assert(r2.getLong(2) == r2.getLong(1)) // floor: syllables == words
    assert(Set("easy", "medium", "hard").contains(r2.getString(5)))
  }
}
