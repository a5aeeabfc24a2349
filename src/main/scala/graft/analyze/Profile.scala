package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling (the ANALYZE-TABLE surface): per-column null counts and
  * exact distinct cardinalities for ANY input schema — the first thing a
  * pipeline runs against a new corpus drop, and the freshness check it
  * runs against every snapshot after.
  *
  * Dynamic-schema operator: the column list comes from the input's
  * resolved schema at plan time (same contract as the reference's
  * data-dependent pivot columns). One aggregation pass — with
  * `exact = true` Catalyst plans the multi-distinct via Expand (one
  * input replica per distinct column), which is the exact-answer cost;
  * `exact = false` swaps in `approx_count_distinct` (HyperLogLog++,
  * ±~2.3% default rsd): ONE input replica total, bounded sketch state
  * through the shuffle — the 100 TB path, where a k-column exact
  * profile would scan-amplify the corpus k×. */
object Profile {

  def tableStats(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    def distinctAgg(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      distinctAgg(c).as(s"${c}__distinct")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
