package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.Temporal
import graft.text.TfIdf

/** Degenerate inputs: every operator must return an empty (or singleton)
  * result on empty / single-row frames, never throw. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }
  private def oneDoc = {
    import spark.implicits._
    Seq((1L, "a single document")).toDF("doc_id", "text")
  }

  test("dedup operators survive empty input") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.dropExactDuplicates(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.tokenJaccardPairs(emptyDocs, "doc_id", "text", 0.9).count() == 0)
    assert(Dedup.minHashLshPairs(emptyDocs, "doc_id", "text", 64, 1, 8, 0.9).count() == 0)
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(TfIdf.tfIdf(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("dedup operators survive a single row (no self-pairs)") {
    assert(Dedup.exactGroups(oneDoc, "doc_id", "text").count() == 0)
    assert(Dedup.dropExactDuplicates(oneDoc, "doc_id", "text").count() == 1)
    assert(Dedup.tokenJaccardPairs(oneDoc, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.minHashLshPairs(oneDoc, "doc_id", "text", 64, 1, 8, 0.5).count() == 0)
    assert(Dedup.simHashPairs(oneDoc, "doc_id", "text").count() == 0)
  }

  test("embedding near-dup survives empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDupPairs(empty, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("temporal operators survive empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("user_id", "ts", "value")
    assert(Temporal.sessionize(empty, "user_id", "ts", 1800L).count() == 0)
    val el = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "t", "lv")
    val er = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "t", "rv")
    assert(Temporal.asOfJoin(el, er, "k", "t", "lv", "rv").count() == 0)
    assert(Temporal.asOfJoinTolerance(el, er, "k", "t", "lv", "rv", 60L).count() == 0)
    assert(graft.plans.AsOfJoin.asOf(spark, el, er, "k", "t", "lv", "rv").count() == 0)
  }

  test("round-4 curation operators survive empty, single-row and empty-text input") {
    import spark.implicits._
    // chunk dedup: empty frame, one doc (nothing duplicated), empty text
    assert(graft.dedup.ChunkDedup.docDupStats(emptyDocs, "doc_id", "text", 8, 0.3).count() == 0)
    val one = graft.dedup.ChunkDedup.docDupStats(oneDoc, "doc_id", "text", 8, 0.3).collect()
    assert(one.length == 1 && one(0).getLong(2) == 0L && one(0).getLong(4) == 1L)
    val blank = graft.dedup.ChunkDedup
      .docDupStats(Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), "doc_id", "text", 8, 0.3)
      .collect()
    assert(blank.length == 2) // both normalize to one empty chunk (shared!)
    assert(blank.forall(_.getLong(2) == 1L), "empty chunks are cross-doc duplicates")
    // pii: empty frame and null text
    assert(graft.text.Pii.piiStats(emptyDocs, "doc_id", "text").count() == 0)
    val nullText = graft.text.Pii.piiStats(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(nullText.isNullAt(4) && nullText.isNullAt(1))
    // quantile cut: empty frame, singleton group (bucket 1 → dropped)
    assert(graft.analyze.QuantileCut
      .buckets(emptyDocs.withColumn("v", lit(0.0)), "text", "v", "doc_id", 5, 1).count() == 0)
    val solo = graft.analyze.QuantileCut
      .buckets(Seq(("g", 1L, 2.0)).toDF("src", "id", "v"), "src", "v", "id", 5, 1)
      .collect()(0)
    assert(solo.getInt(3) == 1 && solo.getLong(4) == 0L)
    // semantic dedup: empty frame and a single vector
    assert(graft.sim.Similarity.semanticDedup(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", 0.5).count() == 0)
    val lone = graft.sim.Similarity.semanticDedup(
      Seq((7L, Array(1.0f, 0.0f), 3)).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", 0.5).collect()(0)
    assert(lone.getLong(0) == 7L && lone.getLong(2) == 7L && lone.getLong(3) == 1L)
    // bloom: empty dim prunes everything; empty fact joins to nothing
    val dimE = Seq.empty[(Long, Long)].toDF("k", "x")
    assert(graft.operators.RuntimeFilter
      .prune(Seq((1L, 2L)).toDF("fk", "y"), "fk", dimE, "k").count() == 0)
  }

  test("weighted compression survives empty and single-row input") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Int)].toDF("f", "label")
    assert(graft.ml.Models.compressWeighted(empty, Seq("f"), "label").count() == 0)
    val one = graft.ml.Models.compressWeighted(
      Seq((1.5, 1)).toDF("f", "label"), Seq("f"), "label").collect()
    assert(one.length == 1 && one.head.getDouble(2) == 1.0)
  }

  test("round-4b operators survive empty and degenerate input") {
    import spark.implicits._
    // chunker: empty frame and empty text
    assert(graft.text.Chunker.tokenWindows(emptyDocs, "doc_id", "text", 8, 2).count() == 0)
    val emptyText = graft.text.Chunker.tokenWindows(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text", 8, 2).collect()
    assert(emptyText.length == 1 && emptyText.head.getAs[Int]("chunk_idx") == 0)
    // upsert: both sides empty / one side empty
    val e = Seq.empty[(Long, String)].toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "v")
    assert(graft.operators.Upsert.upsert(e, e, "k").count() == 0)
    assert(graft.operators.Upsert.upsert(b, e, "k").count() == 1)
    assert(graft.operators.Upsert.upsert(e, b, "k").count() == 1)
    // sorted neighborhood: empty and single row produce no pairs
    assert(graft.dedup.SortedNeighborhood.editDistancePairs(
      emptyDocs, "doc_id", col("text"), col("text"), 2, 5).count() == 0)
    assert(graft.dedup.SortedNeighborhood.editDistancePairs(
      oneDoc, "doc_id", col("text"), col("text"), 2, 5).count() == 0)
    // incremental dedup: empty fresh batch
    assert(Dedup.incrementalExact(emptyDocs, oneDoc, "doc_id", "text").count() == 0)
    // weighted sample: all weights zero -> nothing selected
    val zw = Seq((1L, "g", 0.0), (2L, "g", 0.0)).toDF("id", "g", "w")
    assert(graft.operators.TrainOrder
      .weightedSamplePerGroup(zw, "g", "id", "w", 5).count() == 0)
    // PSI: empty current snapshot -> every base bucket reads full drift
    val base = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "value")
    val cur = Seq.empty[(Long, Double)].toDF("id", "value")
    val psi = graft.analyze.Drift.psi(base, cur, "value", 5).collect()
    assert(psi.nonEmpty && psi.forall(_.getAs[Long]("n_cur") == 0L))
    // entropy: empty frame, single-char doc
    assert(graft.text.CorpusStats.docCharEntropy(emptyDocs, "doc_id", "text").count() == 0)
    val single = graft.text.CorpusStats.docCharEntropy(
      Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text").head
    assert(single.getAs[Double]("entropy_bits") == 0.0)
    // pagerank / kmeans empty inputs
    assert(graft.graph.PageRank.run(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", 3).count() == 0)
    assert(graft.sim.Similarity.kmeansAssign(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding", 3, 2).count() == 0)
    // null/empty vectors drop silently (the exploded-form contract):
    // only the two real vectors come back
    assert(graft.sim.Similarity.kmeansAssign(
      Seq((1L, Seq(1.0f, 0.0f)), (2L, null.asInstanceOf[Seq[Float]]),
        (3L, Seq.empty[Float]), (4L, Seq(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", 2, 2).count() == 2)
    // ragged vector dims fail loudly instead of silently truncating to
    // the first seed's length
    val ragged = intercept[IllegalArgumentException] {
      graft.sim.Similarity.kmeansAssign(
        Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.5f)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", 2, 2).count()
    }
    assert(ragged.getMessage.contains("fixed-dimension"))
  }
}
