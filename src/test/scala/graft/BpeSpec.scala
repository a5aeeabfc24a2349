package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.BpeTrainer

/** BPE merge training: hand-computed merges on a crafted corpus,
  * deterministic tie-breaks, early stop, and the distributed word
  * histogram feeding the loop. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("hand-computed merge sequence on a crafted corpus") {
    // words: "abab" x3, "ab" x2
    // round 1: (a,b) freq 2*3+1*2 = 8 beats (b,a) freq 3 -> merge (a,b)
    // round 2: only (ab,ab) freq 3 remains -> merge (ab,ab)
    // round 3: no adjacent pairs anywhere -> early stop
    val merges = BpeTrainer.trainOnHistogram(Seq(("abab", 3L), ("ab", 2L)), 5)
    assert(merges == Seq(("a", "b", 8L), ("ab", "ab", 3L)))
  }

  test("merge ties break lexicographically — deterministic") {
    val merges = BpeTrainer.trainOnHistogram(Seq(("xy", 2L), ("zw", 2L)), 2)
    assert(merges == Seq(("x", "y", 2L), ("z", "w", 2L)))
  }

  test("end-to-end: corpus word histogram drives the loop, ranks are ordered") {
    import spark.implicits._
    val df = Seq("the cat sat", "the cat", "the the").toDF("text")
    val got = BpeTrainer.train(df, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.length == 3)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // (t,h) and (h,e) both occur 4x (every 'the'); lexicographic
    // tie-break picks (h,e), after which (t,he) still occurs 4x and
    // beats (a,t)'s 3 (cat x2 + sat)
    assert((got(0)._2, got(0)._3, got(0)._4) == (("h", "e", 4L)))
    assert((got(1)._2, got(1)._3, got(1)._4) == (("t", "he", 4L)))
    assert((got(2)._2, got(2)._3, got(2)._4) == (("a", "t", 3L)))
  }

  test("maxVocabWords truncation keeps the heaviest words deterministically") {
    import spark.implicits._
    val df = Seq("aa aa aa bb bb cc").toDF("text")
    // vocab capped at 2: only 'aa' (3) and 'bb' (2) feed the loop
    val merges = BpeTrainer.train(df, "text", 2, maxVocabWords = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(("a", "a", 3L), ("b", "b", 2L)))
  }
}
