package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analyze.SnapshotDiff
import graft.dedup.{Dedup, SentenceDedup}
import graft.text.{Bm25, Contamination}

/** Round-6 additions: containment sim-join, snapshot diff, novelty,
  * sentence dedup, BM25 retrieval. */
class RetrievalDiffSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // ------------------------------------------------- containment pairs

  test("ngramContainmentPairs equals brute force at several thresholds (asymmetric prefix is lossless)") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val vocab = (0 until 25).map(i => s"w$i")
    // dense vocabulary + exact duplicates (pre-collapse path) + explicit
    // SUBSET pairs (the case containment exists for: tiny doc inside big)
    val base = (1 to 100).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (1 to 20).map(j => (200L + j, base(rnd.nextInt(base.size))._2))
    val subs = (1 to 15).map { j =>
      val t = base(rnd.nextInt(base.size))._2.split(" ")
      (300L + j, t.take(math.max(2, t.length / 3)).mkString(" "))
    }
    val docs = (base ++ dups ++ subs).toDF("doc_id", "text")
    val sets = (base ++ dups ++ subs).map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSet }.toMap
    for (threshold <- Seq(0.5, 0.8, 0.9, 1.0)) {
      val got = Dedup.ngramContainmentPairs(docs, "doc_id", "text", 1, threshold)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ids = sets.keys.toSeq.sorted
      val brute = (for {
        a <- ids; b <- ids if a < b
        c = (sets(a) & sets(b)).size.toDouble / math.min(sets(a).size, sets(b).size)
        if c >= threshold
      } yield (a, b)).toSet
      assert(got == brute,
        s"threshold $threshold: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    }
  }

  test("containment finds subset pairs that Jaccard misses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, "doc_id", "text", 1, 0.99)
      .collect()
    assert(cont.length == 1)
    assert(cont(0).getDouble(2) == 1.0)
    val jac = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.5).count()
    assert(jac == 0L, "Jaccard should NOT pair a 3-token subset of a 10-token doc")
  }

  // ----------------------------------------------------- snapshot diff

  test("SnapshotDiff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val v1 = Seq((1L, "aaa"), (2L, "bbb"), (3L, "ccc"), (4L, "ddd")).toDF("id", "content")
    val v2 = Seq((2L, "bbb"), (3L, "ccc EDITED"), (4L, "ddd"), (9L, "new")).toDF("id", "content")
    val got = SnapshotDiff.diff(v1, v2, "id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 9L -> "added"))
    val sum = SnapshotDiff.summary(v1, v2, "id", "content")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("removed" -> 1L, "unchanged" -> 2L, "changed" -> 1L, "added" -> 1L))
  }

  // ----------------------------------------------------------- novelty

  test("ngramNovelty: exact fractions, short docs get null novelty") {
    import spark.implicits._
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text") // 3-grams: "a b c", "b c d"
    val corpus = Seq(
      (1L, "a b c d"),     // both 3-grams known -> novelty 0
      (2L, "a b c x"),     // "a b c" known, "b c x" novel -> 0.5
      (3L, "x y z w"),     // both novel -> 1.0
      (4L, "a b")          // no 3-grams -> null
    ).toDF("doc_id", "text")
    val got = Contamination.ngramNovelty(corpus, ref, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(got == Set((1L, 2L, 0L, 0.0), (2L, 2L, 1L, 0.5),
      (3L, 2L, 2L, 1.0), (4L, 0L, 0L, null)))
  }

  // ---------------------------------------------------- sentence dedup

  test("sentence dedup: keep-first by (doc_id, pos), exact per-doc stats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The sky is blue. Water is wet. The sky is blue. End"),
      (2L, "Water is wet. Something unique here. End"),
      (3L, "")).toDF("doc_id", "text")
    // doc 1: ["The sky is blue", "Water is wet", "The sky is blue", "End"]
    //   (document-final "End" has no trailing split – no punctuation left)
    //   kept: pos0 yes, pos1 yes, pos2 no (dup of pos0), pos3 yes -> 3/4
    // doc 2: ["Water is wet", "Something unique here", "End"]
    //   "Water is wet" first seen in doc1 -> dropped; "End" seen in doc1 -> dropped -> 1/3
    val stats = SentenceDedup.sentenceStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(stats == Set((1L, 4L, 3L, 0.25), (2L, 3L, 1L, 0.6667), (3L, 0L, 0L, null)))
    val dedup = SentenceDedup.dedupSentences(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dedup(1L) == "The sky is blue Water is wet End")
    assert(dedup(2L) == "Something unique here")
    assert(!dedup.contains(3L))
  }

  test("sentence dedup within one document dedups repeated sentences") {
    import spark.implicits._
    val docs = Seq((7L, "Buy now! Buy now! Buy now! Call today.")).toDF("doc_id", "text")
    val stats = SentenceDedup.sentenceStats(docs, "doc_id", "text").head()
    assert(stats.getLong(1) == 4L) // "Buy now","Buy now","Buy now","Call today."
    assert(stats.getLong(2) == 2L)
  }

  // -------------------------------------------------------------- bm25

  test("BM25 matches a hand-computed score and respects k") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian elderberry fig grape")).toDF("doc_id", "text")
    val queries = Seq((10L, "apple")).toDF("qid", "qtext")
    val got = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "qtext", 2)
      .orderBy($"rank").collect()
    // N=3, df(apple)=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    // avgdl = (3+2+4)/3 = 3.0
    // doc1: tf=2, dl=3: idf*2*2.2/(2+1.2*(0.25+0.75*3/3))
    // doc2: tf=1, dl=2: idf*1*2.2/(1+1.2*(0.25+0.75*2/3))
    def term(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): BigDecimal = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      BigDecimal(raw).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val s1 = term(2, 3, 2, 3, 3.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = term(1, 2, 2, 3, 3.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == 2) // k=2 and doc3 has no query terms anyway
    assert(got(0).getLong(1) == 1L && got(0).getDouble(3) == s1)
    assert(got(1).getLong(1) == 2L && got(1).getDouble(3) == s2)
  }

  test("BM25 multi-term queries sum per-term scores; rarer terms dominate ties") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "common rare"),
      (2L, "common common"),
      (3L, "common filler"),
      (4L, "other stuff")).toDF("doc_id", "text")
    val queries = Seq((1L, "common rare")).toDF("qid", "qtext")
    val got = Bm25.topK(corpus, "doc_id", "text", queries, "qid", "qtext", 10)
      .orderBy($"rank").collect()
    // doc1 matches both terms (one of them rare) -> strictly top
    assert(got(0).getLong(1) == 1L)
    assert(got.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
  }

  test("fused rrfBm25Overlap equals the compositional rrf(Seq(bm25, overlap)) exactly") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val queries = docs.filter(pmod($"doc_id", lit(97)) === 0)
      .select($"doc_id".as("qid"),
        concat_ws(" ", slice(graft.text.TextAnalysis.tokens($"text"), 1, 8)).as("qtext"))
    val fused = graft.text.RetrievalFusion.rrfBm25Overlap(
        docs, "doc_id", "text", queries, "qid", "qtext", 10, 60)
      .orderBy($"qid", $"rank").collect().toSeq
    val probe = graft.text.Postings.collectProbe(queries, "qid", "qtext")
    val perDoc = graft.text.Postings.perDocTfUncached(docs, "doc_id", "text", probe.vocab)
    val bm = Bm25.topKFromPostings(perDoc, probe, 10)
      .select($"qid", $"doc_id", $"rank")
    val ov = graft.text.RetrievalFusion.overlapTopKFromPostings(perDoc, probe, 10)
    val composed = graft.text.RetrievalFusion.rrf(Seq(bm, ov), 60, 10)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(fused == composed,
      s"fused != composed: ${fused.take(3)} vs ${composed.take(3)}")
    assert(fused.nonEmpty)
  }
}
