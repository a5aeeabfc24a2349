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

  test("classCentroids equals driver-side math and is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(66)
    val rows = (1 to 400).map { i =>
      (i % 5, Array.fill(8)(rnd.nextFloat() * 2f - 1f)) }
    val df = rows.toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.classCentroids(d, "label", "embedding")
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val got = run(df)
    val re = run(df.repartition(17))
    assert(got == re, "centroids changed under repartitioning")
    rows.groupBy(_._1).foreach { case (label, group) =>
      val n = group.size
      (0 until 8).foreach { d =>
        val mean = group.map(g => BigDecimal(g._2(d).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n
        val r4 = BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gn, gc, _) = got((label, d))
        assert(gn == n.toLong)
        assert(math.abs(gc - r4) < 2e-4, s"label $label dim $d: $gc vs $r4")
      }
    }
  }

  test("pinned IVF: exhaustive probe equals brute force; rerun identical") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val data = emb.filter($"vec_id" >= 5)
    val qs = emb.filter($"vec_id" < 5)
    val brute = topSets(Similarity.bruteTopK(data, "vec_id", "embedding", qs, "vec_id", "embedding", 5))
    val full = topSets(Similarity.ivfTopKPinned(data, "vec_id", "embedding",
      qs, "vec_id", "embedding", 5, nCentroids = 8, nProbe = 8))
    assert(full == brute, "probing every list must reduce to the exact search")
    def run() = Similarity.ivfTopKPinned(data, "vec_id", "embedding",
        qs, "vec_id", "embedding", 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val a = run()
    assert(run() == a, "pinned IVF must be rerun-identical")
    assert(a.nonEmpty && a.forall(_._4 <= 5))
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
