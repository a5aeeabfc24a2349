package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key statistics table
  * up to date by MERGING a delta batch's partial aggregates into the
  * stored state, instead of re-scanning the full history — the batch
  * twin of a streaming stateful agg, and the only affordable shape when
  * the history is 100 TB and the delta is a day.
  *
  * The statistics are chosen mergeable (count/sum/min/max — sums as
  * exact 6-dp longs per the [[ExactAgg]] contract), so
  * `merge(partials(S), partials(Δ)) ≡ partials(S ∪ Δ)` EXACTLY, not
  * approximately; the oracle pins the merged result against a full
  * recompute.
  *
  * Scale shape: the delta aggregates at delta size; the merge is a
  * key-keyed full-outer join of two already-aggregated frames (state
  * table ≪ history). Nothing rescans the history.
  */
object IncrementalAgg {

  /** Per-key mergeable partials: `(key, n, sumq, vmin, vmax)` with `sumq`
    * the exact 6-dp long sum. */
  def partials(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col(valueCol) * lit(1000000)).cast("long")).as("sumq"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Merge two partials frames (same schema as [[partials]] output). */
  def merge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.select(col("key"), col("n").as("n_s"), col("sumq").as("q_s"),
      col("vmin").as("mn_s"), col("vmax").as("mx_s"))
    val d = delta.select(col("key"), col("n").as("n_d"), col("sumq").as("q_d"),
      col("vmin").as("mn_d"), col("vmax").as("mx_d"))
    s.join(d, Seq("key"), "full_outer")
      .select(
        col("key"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("q_s"), lit(0L)) + coalesce(col("q_d"), lit(0L))).as("sumq"),
        least(col("mn_s"), col("mn_d")).as("vmin"), // least/greatest skip nulls
        greatest(col("mx_s"), col("mx_d")).as("vmax"))
  }

  /** Human-facing view of a partials frame: unscaled 4-dp total. */
  def render(p: DataFrame): DataFrame =
    p.select(col("key"), col("n"),
        (round(col("sumq").cast("double") / 100.0) / 10000.0).as("total"),
        col("vmin"), col("vmax"))
      .orderBy(col("key"))
}
