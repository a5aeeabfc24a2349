package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build from a sequence of
  * full snapshots: collapse per-key attribute versions into validity
  * intervals `[valid_from, valid_to)` with an open (null) `valid_to` on
  * the current row — the warehouse-side sibling of
  * [[SnapshotDiff]] (which classifies one transition; this builds the
  * full history table downstream jobs join against).
  *
  * Change detection is per-column null-safe equality against the
  * previous version (`IS DISTINCT FROM` semantics, exactly the oracle's
  * per-column compare): no digest, so no separator/sentinel collision
  * class exists at all — attribute values containing the `\u0001`/
  * `\u0002` control bytes the [[SnapshotDiff]] digest reserves are
  * handled exactly; a key absent from a snapshot simply
  * has no version row for it, closing its last interval at the snapshot
  * where it disappeared is the caller's delete policy (this build keeps
  * the interval open through gaps, the common "late-arriving re-assert"
  * choice, and re-opens a NEW interval if the content changed across the
  * gap).
  *
  * Scale shape: snapshots union in the scan with their version stamp;
  * everything downstream runs on `(key, version, digest)` plus the
  * attribute payload of only the CHANGE rows — the lag/lead windows
  * partition by key (one hash shuffle, reused by both windows since they
  * share the partition key), and no frame ever holds more than one row
  * per (key, version).
  */
object Scd2 {

  /** Build the SCD2 history. `snapshots` are `(version, df)` pairs with
    * identical schemas; `keyCol` identifies the entity; `attrCols` are
    * the tracked attributes. Output: one row per validity interval —
    * `(keyCol, attrCols…, valid_from, valid_to)` with `valid_to` null
    * for the open interval. */
  def history(snapshots: Seq[(Long, DataFrame)], keyCol: String,
              attrCols: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "need at least one snapshot")
    val stamped = snapshots.map { case (v, df) =>
      df.select((col(keyCol) +: attrCols.map(col)) :+ lit(v).as("__v"): _*)
    }.reduce(_.unionAll(_))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    // a version row OPENS an interval iff any tracked attribute IS
    // DISTINCT FROM the previous version's, or it is the key's first
    // appearance (detected on the never-null version stamp, so an
    // all-null first row still opens). All lags share one window spec:
    // a single WindowExec, one shuffle.
    val unchanged = attrCols
      .map(c => col(c) <=> lag(col(c), 1).over(byKey))
      .reduce(_ && _)
    val opens = stamped
      .withColumn("__open",
        lag(col("__v"), 1).over(byKey).isNull || !unchanged)
      .filter(col("__open"))
    // the interval closes where the NEXT change row opens (same window,
    // same partitioning — the second window reuses the first's shuffle)
    opens
      .withColumn("valid_to", lead(col("__v"), 1).over(byKey))
      .select((col(keyCol) +: attrCols.map(col)) :+
        col("__v").as("valid_from") :+ col("valid_to"): _*)
  }

  /** Point-in-time reconstruction: the state as of `version` — rows
    * whose interval covers it (`valid_from ≤ v < valid_to`, open
    * intervals cover everything ≥ their start). For keys PRESENT in
    * snapshot v this reproduces the snapshot row exactly; keys that
    * DISAPPEARED in an earlier snapshot surface with their last-known
    * attributes — [[history]] tracks attribute changes, not deletions
    * (the standard update-only SCD2 simplification; model deletions by
    * writing tombstone rows if they matter). The q199 oracle pins
    * exactly this semantic: snapshot-v content ∪ last-known rows of
    * since-deleted keys. A pure filter: no shuffle. */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to")
}
