package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Similarity
import graft.sources.Tables

/** IVF ANN vs the exact brute-force baseline. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def topSets(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select($"qid", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("ivfTopK with nProbe == nCentroids is EXACT (equals brute force)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val data = emb.filter($"vec_id" >= 5)
    val qs = emb.filter($"vec_id" < 5)
    val brute = topSets(Similarity.bruteTopK(data, "vec_id", "embedding", qs, "vec_id", "embedding", 5))
    val full = topSets(Similarity.ivfTopK(data, "vec_id", "embedding", qs, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 8))
    assert(full == brute, "probing every list must reduce to the exact search")
  }

  test("ivfTopK with partial probes keeps usable recall (k-means quantizer)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val data = emb.filter($"vec_id" >= 5)
    val qs = emb.filter($"vec_id" < 5)
    val brute = topSets(Similarity.bruteTopK(data, "vec_id", "embedding", qs, "vec_id", "embedding", 5))
    val approx = topSets(Similarity.ivfTopK(data, "vec_id", "embedding", qs, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 4))
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
