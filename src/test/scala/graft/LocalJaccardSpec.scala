package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/** Pins the conf-gated small-corpus [[graft.dedup.LocalJaccard]] path
  * bit-identical to the distributed prefix-filter pipeline — pairs,
  * containment, and components, on the real documents fixture (which
  * contains exact-duplicate groups, near-dup pairs, and singletons). */
class LocalJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def docs = Tables.documents(spark, TestSession.sf)

  private def bothPaths(build: => DataFrame): (Seq[String], Seq[String]) = {
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    spark.conf.set("graft.jaccard.localMaxDocs", "16384")
    val local = rows(build)
    spark.conf.set("graft.jaccard.localMaxDocs", "0")
    try rows(build) -> local
    finally spark.conf.set("graft.jaccard.localMaxDocs", "16384")
  }

  test("jaccard pairs: local path == distributed path, bit for bit") {
    val (dist, local) = bothPaths(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    assert(local.nonEmpty, "fixture must produce near-dup pairs")
    assert(local == dist,
      s"local=${local.take(5)}... dist=${dist.take(5)}...")
  }

  test("token jaccard at a loose threshold: both paths agree") {
    val (dist, local) = bothPaths(
      Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.6))
    assert(local == dist)
  }

  test("containment pairs: local path == distributed path") {
    val (dist, local) = bothPaths(
      Dedup.ngramContainmentPairs(docs, "doc_id", "text", 3, 0.9))
    assert(local == dist)
  }

  test("dedupImpact: local per-tau union-find == distributed CC runs") {
    val (dist, local) = bothPaths(
      Dedup.dedupImpact(docs, "doc_id", "text", 3, Seq(0.7, 0.8, 0.9)))
    assert(local == dist)
  }

  test("components: local union-find == distributed star contraction") {
    val (dist, local) = bothPaths(
      Dedup.ngramJaccardComponents(docs, "doc_id", "text", 3, 0.8))
    assert(local.nonEmpty)
    assert(local == dist)
  }
}
