package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Winnowing
import graft.text.CorpusStats

/** Winnowing shared-fingerprint pairs (q393) and MATTR (q394). */
class WinnowMattrSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("winnow pairs: shared long span is found, disjoint texts are not") {
    import spark.implicits._
    val span = "zqvxkw hjplmt rdfgyb ncswau eiotzq"  // rare 35-char span
    val docs = Seq(
      (1L, s"first document carries $span inside the middle of it"),
      (2L, s"completely different framing but $span appears here too"),
      (3L, "nothing in common with anything else written above"),
      (4L, "another unrelated piece of text with its own words")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(docs, "doc_id", "text",
      3L, 50L, 10).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 2L)), s"span pair missing: ${keys.mkString(",")}")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    val row = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(row.getLong(2) >= 3L && row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
  }

  test("winnow pairs: boilerplate above the df cap creates no pairs") {
    import spark.implicits._
    // every doc shares the same header; pairwise texts otherwise disjoint
    val header = "standard license header appears everywhere identically"
    val docs = (1 to 8).map(i =>
      (i.toLong, s"$header unique${i}a unique${i}b unique${i}c")).toDF("doc_id", "text")
    // cap below the 8-doc df of every header fingerprint → nothing pairs
    val pairs = Winnowing.sharedFingerprintPairs(docs, "doc_id", "text",
      1L, 4L, 50).collect()
    assert(pairs.isEmpty, s"boilerplate must be df-capped, got ${pairs.length} pairs")
  }

  test("dedup impact: removal mass grows as τ loosens; exact dups always counted") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base),                                   // keeper of the exact group
      (2L, base),                                   // exact dup → removed at any τ
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // high-J near dup
      (4L, "alpha beta gamma delta unrelated words here now"), // mid-J
      (5L, "totally different content with nothing shared at all")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dedupImpact(docs, "doc_id", "text", 2,
        Seq(0.25, 0.6, 0.95))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    // τ=0.95: only the exact duplicate (doc 2, 8 tokens) is removed
    assert(out(0.95) == ((1L, 8L)), s"tight τ: ${out(0.95)}")
    // loosening τ can only remove MORE
    assert(out(0.6)._1 >= out(0.95)._1 && out(0.25)._1 >= out(0.6)._1)
    // at 0.25 the near-dup cluster {1,2,3,4} (doc 4 joins at J=3/11)
    // collapses to one keeper
    assert(out(0.25)._1 == 3L, s"loose τ: ${out(0.25)}")
  }

  test("embedding disagreement flags the corrupted vector, not healthy near-dups") {
    import spark.implicits._
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, txt), (2L, txt), (3L, txt),
      (4L, "completely different text with no shared trigrams at all here"))
      .toDF("doc_id", "text")
    val good = Array(1.0f, 0.2f, 0.1f, 0.0f)
    val goodish = Array(0.99f, 0.21f, 0.1f, 0.0f)
    val broken = Array(-0.5f, 0.9f, -0.2f, 0.3f)   // stale/shuffled vector
    val embs = Seq((1L, good), (2L, goodish), (3L, broken), (4L, good))
      .toDF("vec_id", "embedding")
    val out = graft.dedup.Dedup.embeddingDisagreement(docs, embs,
        "doc_id", "text", "vec_id", "embedding", 3, 0.8, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // pairs (1,3) and (2,3) disagree; (1,2) agrees; doc 4 never pairs
    assert(out.toSet == Set((1L, 3L), (2L, 3L)), s"got ${out.toSeq}")
  }

  test("mattr: hand-built periodic and constant docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b"),  // every 3-window has 3 distinct → 1.0
      (2L, "x x x x x x"),      // every 3-window has 1 distinct → 1/3
      (3L, "p q")               // shorter than window → plain TTR = 1.0
    ).toDF("doc_id", "text")
    val out = CorpusStats.mattr(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((8L, 3L, 0.375, 1.0)))
    assert(out(2L)._4 == 0.333333)
    assert(out(3L) == ((2L, 2L, 1.0, 1.0)))
  }

  test("mattr matches the brute per-window distinct count on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = Vector("red", "blue", "green", "ochre", "teal")
    val docs = (1 to 12).map { i =>
      val n = 5 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val w = 7
    val got = CorpusStats.mattr(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    docs.foreach { case (id, text) =>
      val ts = text.split(" ")
      val expect =
        if (ts.length < w) ts.distinct.length.toDouble / ts.length
        else {
          val per = (0 to ts.length - w).map(s => ts.slice(s, s + w).distinct.length)
          per.sum.toDouble / (w.toLong * per.size)
        }
      assert(math.abs(got(id) - expect) < 1e-6,
        s"doc $id: got ${got(id)}, brute $expect")
    }
  }

  test("boilerplate prefixes: shared openers surface per source, unique ones do not") {
    import spark.implicits._
    val hdr = "creative commons license applies to this document text here"
    val docs =
      (1 to 5).map(i => (s"doc body $i", "web", s"$hdr unique tail $i")) ++
      Seq(("x", "web", "a singular opening never repeated anywhere else one")) ++
      (1 to 3).map(i => (s"b$i", "books", s"$hdr differing continuation $i"))
    val df = docs.map { case (_, s, t) => (s, t) }.toDF("source", "text")
    val out = CorpusStats.boilerplatePrefixes(df, "source", "text", 8, 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val p8 = hdr.split(" ").take(8).mkString(" ")
    assert(out.toSet == Set(("web", p8, 5L), ("books", p8, 3L)), s"got ${out.toSeq}")
  }
}
