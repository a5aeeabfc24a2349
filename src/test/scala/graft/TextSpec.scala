package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Winnowing rolling-hash fingerprints — the SIGMOD'03 guarantee. */
class TextSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def fps(texts: String*): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextAnalysis.winnowingFingerprints($"text").as("fps"))
      .collect().map(_.getSeq[Long](0).toSet).toSeq
  }

  test("documents sharing a long substring share a fingerprint; output is deterministic") {
    val common = "the quick brown fox jumps over the lazy dog tonight"
    val Seq(a, b, c, a2) = fps(
      s"PREFIX AAA $common SUFFIX BBB",
      s"zzz different start $common other ending here",
      "completely unrelated material built from other vocabulary entirely",
      s"PREFIX AAA $common SUFFIX BBB")
    assert((a & b).nonEmpty, "shared substring >= w+k-1 must share a fingerprint")
    assert(a == a2, "fingerprinting must be deterministic")
    assert((a & c).size < (a & b).size,
      "unrelated text must share fewer fingerprints than overlapping text")
  }

  test("tfIdf matches a local brute-force computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry durian")).toDF("doc_id", "text")
    val got = graft.text.TfIdf.tfIdf(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val corpus = Map(1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("banana", "cherry"), 3L -> Seq("cherry", "cherry", "durian"))
    val n = corpus.size
    val dfreq = corpus.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    for ((doc, toks) <- corpus; (term, tf) <- toks.groupBy(identity).view.mapValues(_.size)) {
      val df = dfreq(term)
      val expect = tf * (math.log((n + 1.0) / (df + 1.0)) + 1.0)
      val (gTf, gDf, gW) = got((doc, term))
      assert(gTf == tf && gDf == df, s"counts off for ($doc,$term)")
      assert(math.abs(gW - expect) < 1e-12, s"weight off for ($doc,$term): $gW vs $expect")
    }
    assert(got.size == corpus.toSeq.flatMap { case (_, ts) => ts.distinct }.size)
  }

  test("fingerprints are sorted distinct and short inputs degrade gracefully") {
    val Seq(tiny, empty) = fps("abc", "")
    assert(tiny.isEmpty && empty.isEmpty, "inputs shorter than k yield no fingerprints")
    val Seq(one) = fps("abcdefgh")
    assert(one.nonEmpty, "inputs >= k chars but < one window still emit a fingerprint")
  }
}
