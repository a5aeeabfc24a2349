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
  * data-dependent pivot columns). One aggregation pass — Catalyst plans
  * the multi-distinct via Expand (one input replica per distinct
  * column), which is the exact-answer cost; at 100 TB swap
  * `approx_count_distinct` / [[graft.operators.Sketches]] for the
  * single-replica sketch pass. */
object Profile {

  def tableStats(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
