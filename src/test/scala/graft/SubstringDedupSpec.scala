package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SubstringDedup

/** Content-anchored window-fingerprint substring duplication:
  * alignment-invariance and non-detection of unique / intra-doc-only
  * content. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Deterministic pseudo-random word soup: `n` 6-letter tokens. */
  private def words(tag: String, n: Int): String = {
    val rnd = new scala.util.Random(tag.hashCode)
    (1 to n).map(_ => (1 to 6).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .mkString(" ")
  }

  test("a shared 60-token span is detected at ANY token alignment") {
    val boiler = words("boiler", 60) // window 20, anchors every ~4 tokens
    for (offset <- Seq(0, 1, 7, 23)) {
      val docs = Seq(
        (1L, "s1", (if (offset == 0) "" else words("pre1", offset) + " ") +
          boiler + " " + words("tail1", 30)),
        (2L, "s2", words("pre2", 51) + " " + boiler + " " + words("tail2", 9))
      ).toDF("doc_id", "source", "text")
      val got = SubstringDedup
        .perSourceReport(docs, "doc_id", "source", "text", 20, 4)
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Long]("dup_windows")).toMap
      assert(got("s1") > 0 && got("s2") > 0,
        s"offset $offset: shared 60-token span must be caught on both sides")
    }
  }

  test("fully distinct documents have zero duplicated windows") {
    val docs = (1 to 6).map(i => (i.toLong, "s", words(s"d$i", 80)))
      .toDF("doc_id", "source", "text")
    val row = SubstringDedup
      .perSourceReport(docs, "doc_id", "source", "text", 20, 4).head
    assert(row.getAs[Long]("dup_windows") == 0L)
    assert(row.getAs[Double]("dup_ratio") == 0.0)
    assert(row.getAs[Long]("n_docs") == 6L && row.getAs[Long]("n_windows") > 0)
  }

  test("intra-doc repetition alone is NOT cross-doc duplication") {
    val span = words("selfrep", 25)
    val docs = Seq(
      (1L, "s", span + " " + span + " " + span), // repeats inside one doc
      (2L, "s", words("other", 80))
    ).toDF("doc_id", "source", "text")
    val row = SubstringDedup
      .perSourceReport(docs, "doc_id", "source", "text", 20, 4).head
    assert(row.getAs[Long]("dup_windows") == 0L)
  }

  test("short docs contribute no windows but count as docs") {
    val docs = Seq((1L, "s", "tiny doc"), (2L, "s", words("long", 60)))
      .toDF("doc_id", "source", "text")
    val row = SubstringDedup
      .perSourceReport(docs, "doc_id", "source", "text", 20, 4).head
    assert(row.getAs[Long]("n_docs") == 2L)
    assert(row.getAs[Long]("n_windows") > 0L)
  }

  test("anchor selection is content-defined: same doc twice, same windows") {
    val text = words("stable", 100)
    val a = SubstringDedup.topWindows(
      Seq((1L, text), (2L, text)).toDF("doc_id", "text"),
      "doc_id", "text", 20, 4, 100).collect()
    assert(a.nonEmpty)
    // every window of doc 1 is matched by doc 2 → all fingerprints reach 2
    assert(a.forall(_.getAs[Long]("n_docs") == 2L))
  }

  test("topWindows surfaces the boilerplate fingerprint with its reach") {
    val boiler = words("wide", 60)
    val docs = (1 to 5).map(i =>
      (i.toLong, words(s"pre$i", 10 + i) + " " + boiler))
      .toDF("doc_id", "text")
    val top = SubstringDedup.topWindows(docs, "doc_id", "text", 20, 4, 5)
      .collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[Long]("n_docs") == 5L)
  }

  test("duplicatedSpans recovers the exact shared span and nothing else") {
    val boiler = words("span-boiler", 45) // 45 shared tokens, window 20
    val docs = Seq(
      (1L, boiler + " " + words("tail-a", 40)),
      (2L, words("pre-b", 13) + " " + boiler + " " + words("tail-b", 25)))
      .toDF("doc_id", "text")
    val got = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: span tokens 1..45; doc 2: offset 13 → tokens 14..58.
    // windows per doc: 45-20+1 = 26 contiguous hits → one maximal span
    assert(got == Seq((1L, 1L, 45L, 26L), (2L, 14L, 58L, 26L)), s"got=$got")
    // unique corpora yield nothing
    val uniq = Seq((1L, words("u1", 80)), (2L, words("u2", 80)))
      .toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(uniq, "doc_id", "text", 20)
      .count() == 0L)
    // TWO disjoint shared spans in one doc stay TWO islands
    val s1 = words("s1", 25); val s2 = words("s2", 25)
    val two = Seq(
      (1L, s1 + " " + words("gap", 30) + " " + s2),
      (2L, s2 + " " + words("other", 40)),
      (3L, words("misc", 35) + " " + s1))
      .toDF("doc_id", "text")
    val spans1 = SubstringDedup.duplicatedSpans(two, "doc_id", "text", 20)
      .filter($"doc_id" === 1L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans1 == Seq((1L, 1L, 25L, 6L), (1L, 56L, 80L, 6L)), s"got=$spans1")
  }

  test("removeDuplicatedSpans: the min-doc owner keeps the span, " +
       "others lose exactly it; unique docs pass through normalized") {
    val boiler = words("rm-boiler", 30)
    val tailB = words("rm-tail-b", 15)
    val docs = Seq(
      (1L, boiler + " " + words("rm-tail-a", 20)),
      (2L, boiler + " " + tailB),
      (3L, words("rm-solo", 40)))
      .toDF("doc_id", "text")
    val got = SubstringDedup
      .removeDuplicatedSpans(docs, "doc_id", "text", 20)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is the owner of every shared fingerprint: nothing removed
    assert(got(1L)._3 == 0L && got(1L)._2 == 50L, s"owner row ${got(1L)}")
    // doc 2 loses exactly the 30 boiler tokens, keeps its own tail
    assert(got(2L)._3 == 30L, s"dup row ${got(2L)}")
    assert(got(2L)._4 == tailB, s"cleaned ${got(2L)._4}")
    // doc 3 untouched: full token count, zero removed
    assert(got(3L)._3 == 0L && got(3L)._2 == 40L)
    // the survivor's cleaned text still contains the boilerplate
    assert(got(1L)._4.startsWith(boiler))
  }

  test("removeDuplicatedSpans keeps a NULL-text doc present " +
       "(one empty-token row, nothing removed)") {
    val boiler = words("null-boiler", 30)
    val docs = Seq(
      (1L, boiler),
      (2L, boiler + " " + words("null-tail", 10)),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = SubstringDedup
      .removeDuplicatedSpans(docs, "doc_id", "text", 20)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // the null-text doc must not vanish: split("") = [""] → 1 token kept
    assert(got.contains(3L), s"null-text doc dropped: ${got.keySet}")
    assert(got(3L) == ((3L, 1L, 0L, "")), s"null row ${got(3L)}")
    assert(got(2L)._3 == 30L)
  }
}
