package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-size estimation WITHOUT executing the join: per-key multiplicity
  * histograms of both sides meet on the key, and the inner-join output
  * cardinality is EXACTLY `Σ_k cnt_a(k)·cnt_b(k)` — the planning
  * diagnostic behind "will this join explode" (companion to
  * [[Skew.keyReport]], which profiles one side; this predicts the
  * product).
  *
  * Scale shape: two key-keyed count aggregates (each a fraction of its
  * side's scan) and a join of the two HISTOGRAMS — |distinct keys| rows,
  * not |rows| — so the cost is two aggregations regardless of how big the
  * joined output would have been. The per-row product runs in
  * DECIMAL(19,0)² so a hot key squared can't overflow the long.
  */
object JoinStats {

  /** One row: `(n_left, n_right, matched_keys, left_only_keys,
    * right_only_keys, est_inner_rows, max_key_contrib)`. */
  def innerJoinSize(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String): DataFrame = {
    val a = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("ca"))
    val b = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("cb"))
    a.join(b, Seq("key"), "full_outer")
      .select(
        col("key"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        (col("ca").cast("decimal(19,0)") * col("cb").cast("decimal(19,0)"))
          .as("prod"))
      .agg(
        sum(col("ca")).as("n_left"),
        sum(col("cb")).as("n_right"),
        sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
          .as("matched_keys"),
        sum(when(col("cb") === 0, 1L).otherwise(0L)).as("left_only_keys"),
        sum(when(col("ca") === 0, 1L).otherwise(0L)).as("right_only_keys"),
        sum(coalesce(col("prod"), lit(0).cast("decimal(19,0)")))
          .cast("decimal(38,0)").cast("long").as("est_inner_rows"),
        max(coalesce(col("prod"), lit(0).cast("decimal(19,0)")))
          .cast("long").as("max_key_contrib"))
  }
}
