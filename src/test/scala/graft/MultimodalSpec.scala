package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def media = Multimodal.ingestFromDocuments(
    Tables.documents(spark, TestSession.sf), "doc_id", "text")

  test("ingest: payload bytes equal UTF-8 text bytes; kinds round-robin") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSession.sf)
    val joined = media.join(docs, col("media_id") === col("doc_id"))
    val bad = joined.filter(length($"payload") =!= length(encode($"text", "UTF-8"))).count()
    assert(bad == 0)
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and entropy is sane") {
    import spark.implicits._
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
    f1.foreach { f =>
      assert(f.byte_entropy >= 0 && f.byte_entropy <= 8, s"entropy out of range: $f")
      assert(f.mean_byte > 0 && f.mean_byte < 256)
      f.kind match {
        case "image" => assert(f.width > 0 && f.height > 0 && f.sample_rate == 0)
        case "audio" => assert(f.sample_rate > 0 && f.width == 0)
        case "video" => assert(f.width > 0 && f.height > 0)
      }
    }
  }

  test("frame sampling keeps ceil(nFrames/stride) frames in order") {
    import spark.implicits._
    val sampled = Multimodal.frameSample(media, frameBytes = 16, stride = 4)
      .select($"media_id", $"payload", $"sampled", $"n_frames", $"n_kept").collect()
    sampled.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val kept = r.getAs[Array[Byte]]("sampled")
      val expected = payload.grouped(16).zipWithIndex
        .collect { case (f, i) if i % 4 == 0 => f }.flatten.toArray
      assert(kept.sameElements(expected), s"frame content mismatch for ${r.getLong(0)}")
      assert(r.getInt(3) == math.ceil(payload.length / 16.0).toInt)
      assert(r.getInt(4) == math.ceil(r.getInt(3) / 4.0).toInt)
    }
  }

  test("resize caps payload near the byte budget and is a no-op under it") {
    import spark.implicits._
    val resized = Multimodal.resizeToBudget(media, 64)
      .select($"media_id", length($"payload").as("n")).as[(Long, Int)].collect()
    resized.foreach { case (id, n) => assert(n <= 64 + 1, s"media $id still $n bytes") }
    val small = Multimodal.resizeToBudget(media, 1 << 20)
    val diff = small.join(media.withColumnRenamed("payload", "orig"), "media_id")
      .filter(md5($"payload") =!= md5($"orig")).count()
    assert(diff == 0, "under-budget payloads must be untouched")
  }
}
