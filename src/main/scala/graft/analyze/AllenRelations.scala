package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Allen interval-algebra histogram (Allen 1983): classify, per unit,
  * the temporal relation between two derived intervals (one per
  * activity) into the 13 exhaustive, mutually exclusive Allen
  * relations — before/meets/overlaps/starts/during/finishes, their
  * inverses, and equals. Where [[graft.operators.IntervalJoin]] asks
  * "WHICH intervals overlap", this asks "HOW do they relate" — the
  * audit that distinguishes sessions that merely touch from sessions
  * nested inside another activity.
  *
  * Intervals are `[min ts, max ts]` of each activity per unit (a
  * single-event activity is a degenerate point interval — handled by
  * the same 13-way classification). The relation is a pure CASE chain
  * over four timestamp comparisons — identical text on both engines,
  * no arithmetic at all. One unit-keyed aggregate; output
  * `(relation, n_units)` ordered by relation. */
object AllenRelations {

  def histogram(df: DataFrame, unitCol: Column, tsCol: Column,
                aFilter: Column, bFilter: Column): DataFrame = {
    val per = df.groupBy(unitCol.as("u"))
      .agg(min(when(aFilter, tsCol)).as("as_"),
        max(when(aFilter, tsCol)).as("ae"),
        min(when(bFilter, tsCol)).as("bs"),
        max(when(bFilter, tsCol)).as("be"))
      .filter(col("as_").isNotNull && col("bs").isNotNull)
    val rel =
      when(col("as_") === col("bs") && col("ae") === col("be"), "equals")
        .when(col("ae") < col("bs"), "before")
        .when(col("be") < col("as_"), "after")
        .when(col("ae") === col("bs"), "meets")
        .when(col("be") === col("as_"), "met_by")
        .when(col("as_") === col("bs") && col("ae") < col("be"), "starts")
        .when(col("as_") === col("bs"), "started_by")
        .when(col("ae") === col("be") && col("as_") > col("bs"), "finishes")
        .when(col("ae") === col("be"), "finished_by")
        .when(col("as_") > col("bs") && col("ae") < col("be"), "during")
        .when(col("as_") < col("bs") && col("ae") > col("be"), "contains")
        .when(col("as_") < col("bs"), "overlaps")
        .otherwise("overlapped_by")
    per.select(rel.as("relation"))
      .groupBy(col("relation")).agg(count(lit(1)).as("n_units"))
      .orderBy(col("relation"))
  }
}
