package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing: classify every document id across two corpus
  * versions as `added` / `removed` / `changed` / `unchanged` — the audit
  * step between crawl refreshes (what did the new ingest actually do?)
  * and the input to incremental downstream passes (only `added` +
  * `changed` need re-scoring; see [[graft.dedup.Dedup.incrementalExact]]
  * for the dedup analogue).
  *
  * Scale shape: both corpora reduce to `(id, md5(content))` digests in
  * the scan projection — the full-outer join shuffles 48 bytes per
  * document, never text. The digest join is the ONLY shuffle; at 100 TB
  * the digest frames are ~3 orders of magnitude smaller than the
  * corpora, and persisting one version's digest index turns every
  * subsequent diff into a single-sided scan. Content equality by 128-bit
  * digest: collision odds are negligible (the same contract as
  * exact-dedup fingerprints), and any engine recomputes the identical
  * digest — the status column is portable.
  */
object SnapshotDiff {

  /** Per-id diff status between `old` and `cur`:
    * `(id, status)` where status ∈ added | removed | changed | unchanged.
    * Ids must be unique within each version (enforce upstream — a
    * duplicated id would cross-join its digest rows). */
  def diff(old: DataFrame, cur: DataFrame,
           idCol: String, contentCol: String): DataFrame = {
    val o = old.select(col(idCol).as("id"), md5(col(contentCol)).as("oh"))
    val c = cur.select(col(idCol).as("id"), md5(col(contentCol)).as("ch"))
    o.join(c, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("oh").isNull, lit("added"))
          .when(col("ch").isNull, lit("removed"))
          .when(col("oh") === col("ch"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Aggregate form: one row per status with its document count. */
  def summary(old: DataFrame, cur: DataFrame,
              idCol: String, contentCol: String): DataFrame =
    diff(old, cur, idCol, contentCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
