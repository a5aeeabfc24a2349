package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot UPSERT (MERGE INTO semantics over immutable snapshots):
  * rows of `updates` replace same-key rows of `base`, new keys are
  * inserted, unmatched base rows pass through — the corpus-refresh step
  * of a pipeline whose storage is append-only parquet/ORC snapshots
  * (no transactional table format required: read snapshot N, merge the
  * change batch, write snapshot N+1).
  *
  * Scale shape: ONE key shuffle (full outer sort-merge join). The change
  * batch is typically small — AQE broadcasts it when it fits and the
  * base side then never shuffles at all. Column-wise semantics:
  * update-wins per ROW (`updates` provides the whole row), chosen over
  * per-column coalesce so a legitimate null in an update is an
  * assignment, not a fallthrough.
  */
object Upsert {

  /** `base` and `updates` must share the schema; `keyCol` is the merge
    * key (unique per side — enforce upstream, duplicate keys would
    * cross-product in the join). */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schemas must match: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val b = base.alias("b")
    // presence FLAG, not key-null-ness, decides which side a row came
    // from: an update row with a null merge key never joins, and testing
    // u.keyCol would then select the (all-null) base side — emitting a
    // garbage row and silently discarding the update's payload
    val u = updates.withColumn("__upd", lit(1)).alias("u")
    val joined = b.join(u, col(s"b.$keyCol") <=> col(s"u.$keyCol"), "full_outer")
    val updateWins = col("u.__upd").isNotNull
    val cols = base.columns.map { c =>
      when(updateWins, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }
    joined.select(cols.toIndexedSeq: _*)
  }
}
