package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entry-path analysis: the top event-type sequences users open with —
  * the navigation-flow readout next to [[Funnel]] (which checks ONE
  * hypothesized path; this discovers which paths exist) and
  * [[Itemsets.prefixSpan]] (which counts non-contiguous subsequences;
  * this keys on the exact contiguous prefix).
  *
  * Determinism: the per-user order is the total order `(ts, tie)`; the
  * path string is the first `depth` events joined with `>`; users with
  * fewer than `depth` events report their full (shorter) path.
  *
  * Scale shape: one user-keyed window sort (rank + filter to `depth` rows
  * per user — the window frame never materializes whole histories), a
  * per-user `collect_list` over ≤`depth` rows, then a path-keyed rollup
  * whose cardinality is bounded by |event types|^depth, not by users.
  */
object Paths {

  /** `(path, n_users)` for the first `depth` events per user, most common
    * first. */
  def entryPaths(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, tieCol: String, depth: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol).as("u"), col(typeCol).as("t"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= depth)
      .groupBy(col("u"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("rn"), col("t")))),
          x => x.getField("t")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }
}
