package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Capture-recapture estimate of UNDETECTED duplication: run two cheap,
  * roughly independent duplicate detectors (head-fingerprint and
  * tail-fingerprint groups), treat their flag sets as two "captures" of
  * the same underlying duplicated-document population, and apply the
  * Chapman bias-corrected Lincoln-Petersen estimator
  * `N̂ = (n_A+1)(n_B+1)/(m+1) − 1` — the ecology trick (Chapman 1951)
  * repurposed as a dedup-pipeline COVERAGE audit: how many duplicated
  * docs do the cheap passes likely miss. One row:
  * `(n_a, n_b, overlap, union_flagged, chapman_total, missed_est)` —
  * missed at 1 dp (estimator minus the observed union, floored at 0).
  *
  * Scale shape: two fingerprint hash-aggregates over one scan each +
  * a doc-level join of two flag frames — digest-only shuffles, the
  * [[Dedup]] contract. */
object CaptureRecapture {

  def chapman(df: DataFrame, idCol: Column, textCol: Column,
              prefixLen: Int = 64): DataFrame = {
    require(prefixLen > 0, s"need prefixLen > 0: $prefixLen")
    def flagged(fp: Column): DataFrame =
      df.select(idCol.as("id"), fp.as("fp"))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .filter(col("n") > 1).select(col("id"))
    // tail fingerprint via reverse+prefix: negative-start substring
    // semantics differ across engines (Spark counts from the end,
    // PG-family engines return empty) — reverse() is portable
    val head = flagged(md5(substring(textCol, 1, prefixLen)))
    val tail = flagged(md5(substring(reverse(textCol), 1, prefixLen)))
    val a = head.agg(count(lit(1)).as("n_a"))
    val b = tail.agg(count(lit(1)).as("n_b"))
    val m = head.join(tail, "id").agg(count(lit(1)).as("m"))
    val u = head.union(tail).distinct().agg(count(lit(1)).as("u"))
    a.crossJoin(b).crossJoin(m).crossJoin(u).select({
      val chap = (col("n_a") + 1).cast("double") *
        (col("n_b") + 1).cast("double") / (col("m") + 1).cast("double") -
        lit(1.0)
      Seq(col("n_a"), col("n_b"), col("m").as("overlap"),
        col("u").as("union_flagged"),
        round(chap, 1).as("chapman_total"),
        round(greatest(chap - col("u").cast("double"), lit(0.0)), 1)
          .as("missed_est"))
    }: _*)
  }
}
