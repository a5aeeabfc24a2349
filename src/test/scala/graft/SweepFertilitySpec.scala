package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.UnigramLm

/** Jaccard threshold sweep (q303) and unigram fertility (q304). */
class SweepFertilitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("threshold sweep is monotone non-increasing and grid-total") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),         // exact dup of 1 → J = 1.0
      (3L, "a b c d e f g x"),         // near dup of 1
      (4L, "p q r s t u v w"))         // unrelated
      .toDF("doc_id", "text")
    val r = Dedup.jaccardThresholdSweep(docs, "doc_id", "text", 3,
      Seq(0.6, 0.7, 0.8, 0.9)).collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2)))
    assert(r.map(_._1).toSeq == Seq(0.6, 0.7, 0.8, 0.9)) // every τ reports
    // survival curves never rise with τ
    assert(r.sliding(2).forall(p => p(0)._2 >= p(1)._2 && p(0)._3 >= p(1)._3))
    // the exact-dup pair (J = 1.0) survives the tightest τ
    assert(r.last._2 >= 1 && r.last._3 >= 2)
  }

  test("unigram fertility on a single-piece corpus is 1 piece per word") {
    import spark.implicits._
    val docs = Seq("abab abab", "abab").toDF("text")
    val r = UnigramLm.fertility(docs, "text", vocabSize = 16,
      maxPieceLen = 4, rounds = 2).collect().head
    assert(r.getLong(0) == 1 && r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 4.0) // "abab" is the piece
  }

  test("prefix cache savings count duplicate prefixes only") {
    import spark.implicits._
    import graft.text.FeatureHashing
    // docs 1,2 share an 8+-token prefix; doc 3 is unrelated; doc 4 is a
    // short exact dup of doc 5 (prefix = whole 3-token doc)
    val docs = Seq(
      "a b c d e f g h tail one more",
      "a b c d e f g h different ending here",
      "z y x w v u t s r q",
      "tiny doc here",
      "tiny doc here").toDF("text")
    val r = FeatureHashing.prefixCacheReport(docs, "text", Seq(8))
      .collect().head
    assert(r.getInt(0) == 8 && r.getLong(1) == 5)
    // two shared groups: the long-prefix pair and the tiny-doc pair
    assert(r.getLong(2) == 2 && r.getLong(3) == 4)
    // saved = 8 (long pair) + 3 (tiny pair, short doc prefix = len)
    assert(r.getLong(4) == 11)
  }
}
