package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.ChunkDedup
import graft.text.Pii
import graft.analyze.QuantileCut

/** Round-4 curation operators: chunk-level exact dedup (brute-force
  * equivalence + plan shape), PII redaction (known vectors + no false
  * positives), per-group quantile cut (exact bucket arithmetic). */
class CurateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // ---- ChunkDedup -------------------------------------------------------

  private def bruteChunks(text: String, w: Int): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.grouped(w).map(_.mkString(" ")).toSeq

  test("chunking equals grouped token windows, including short last chunk") {
    import spark.implicits._
    val docs = Seq(
      "a b c d e f g h i",       // 2 chunks of w=8: 8 + 1
      "one two three",           // single short chunk
      "x",                       // 1 token
      (1 to 64).map(i => s"t$i").mkString(" ")) // exactly 8 chunks
    val got = docs.toDF("text")
      .select(ChunkDedup.chunks(col("text"), 8).as("ch"))
      .collect().map(_.getSeq[String](0).toSeq)
    docs.zip(got).foreach { case (d, g) =>
      assert(g == bruteChunks(d, 8), s"doc '$d'")
    }
  }

  test("docDupStats: shared chunks across docs are counted, within-doc repeats are not dup") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // one 8-token chunk
    val docs = Seq(
      (1L, s"$shared unique1 u2 u3 u4 u5 u6 u7 u8"), // chunk0 shared, chunk1 unique
      (2L, s"$shared only"),                          // chunk0 shared, chunk1 'only'
      (3L, "totally different words here nothing shared at all"),
      (4L, s"$shared $shared")                        // both chunks shared with 1,2
    ).toDF("doc_id", "text")
    val got = ChunkDedup.docDupStats(docs, "doc_id", "text", 8, 0.6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got(1L) == ((2L, 1L, 1L)))  // 1/2 dup < 0.6 → keep
    assert(got(2L) == ((2L, 1L, 1L)))
    assert(got(3L) == ((1L, 0L, 1L)))
    assert(got(4L) == ((2L, 2L, 0L)))  // fully duplicated → dropped
    val kept = ChunkDedup.filterDuplicated(docs, "doc_id", "text", 8, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("chunking is a zero-shuffle projection; digests (not text) cross the dedup shuffle") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val chunkPlan = df.select(ChunkDedup.chunks(col("text"), 8).as("c"))
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"), s"chunking must not shuffle:\n$chunkPlan")
    // the aggregate input projects (id, md5) only — no text column survives
    val statsPlan = ChunkDedup.docDupStats(df, "doc_id", "text", 8, 0.3)
      .queryExecution.optimizedPlan.toString
    assert(statsPlan.contains("md5"), statsPlan)
  }

  // ---- Pii --------------------------------------------------------------

  test("pii scrub: known vectors are redacted, counts match") {
    import spark.implicits._
    val rows = Seq(
      (1L, "reach me at jane.doe+x@sub.example.org today"),
      (2L, "cc 25-989-741-2988 and backup 11-222-333-4444"),
      (3L, "host 192.168.0.1 gateway 10.0.0.254"),
      (4L, "clean text with no identifiers at all"),
      (5L, "a@b.co 12-345-678-9012 1.2.3.4"))
    val got = Pii.piiStats(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((1L, 0L, 0L, "reach me at [EMAIL] today")))
    assert(got(2L) == ((0L, 2L, 0L, "cc [PHONE] and backup [PHONE]")))
    assert(got(3L) == ((0L, 0L, 2L, "host [IP] gateway [IP]")))
    assert(got(4L) == ((0L, 0L, 0L, "clean text with no identifiers at all")))
    assert(got(5L) == ((1L, 1L, 1L, "[EMAIL] [PHONE] [IP]")))
  }

  test("pii scrub has no false positives on word-soup corpus text") {
    import spark.implicits._
    val df = Seq((1L, "key agg row scan slow fast table value part hash"))
      .toDF("id", "text")
    val r = Pii.piiStats(df, "id", "text").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 0L, 0L)))
    assert(r.getString(4) == "key agg row scan slow fast table value part hash")
    val plan = Pii.piiStats(df, "id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pii scrub must be a pure projection:\n$plan")
  }

  // ---- QuantileCut ------------------------------------------------------

  test("quantile buckets: exact ntile arithmetic per group, cut drops bottom bucket") {
    import spark.implicits._
    // group g1: 10 rows → 5 buckets of 2; g2: 7 rows → sizes 2,2,1,1,1
    val rows = (1 to 10).map(i => ("g1", i.toLong, i.toDouble)) ++
      (1 to 7).map(i => ("g2", (100 + i).toLong, (10 - i).toDouble))
    val got = QuantileCut.buckets(rows.toDF("src", "id", "v"), "src", "v", "id", 5, 1)
      .collect().map(r => r.getLong(1) -> ((r.getInt(3), r.getLong(4)))).toMap
    // g1 ascending by v: ids 1,2 → b1; 3,4 → b2; ... 9,10 → b5
    assert(got(1L) == ((1, 0L)) && got(2L) == ((1, 0L)))
    assert(got(3L) == ((2, 1L)) && got(10L) == ((5, 1L)))
    // g2 v descending with id: lowest v = id 107 → bucket 1 (first 2 by v asc: 107,106)
    assert(got(107L)._1 == 1 && got(106L)._1 == 1)
    assert(got(101L)._1 == 5) // highest v, single-row bucket
    val kept = QuantileCut.cut(rows.toDF("src", "id", "v"), "src", "v", "id", 5, 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(2L) && !kept.contains(107L) && !kept.contains(106L))
    assert(kept.size == rows.size - 4)
  }

  test("quantile cut ties are broken by id — deterministic across engines") {
    import spark.implicits._
    val rows = (1 to 10).map(i => ("g", i.toLong, 1.0)) // all-tied values
    val b = QuantileCut.buckets(rows.toDF("src", "id", "v"), "src", "v", "id", 5, 1)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(b(1L) == 1 && b(2L) == 1 && b(3L) == 2 && b(9L) == 5 && b(10L) == 5)
  }
}
