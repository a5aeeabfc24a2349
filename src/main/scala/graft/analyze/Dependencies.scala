package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-dependency profiling — functional dependencies (does A
  * determine B?) and inclusion dependencies (is A a foreign key into
  * B?): the discovery half of data-contract enforcement, next to
  * [[Expectations]] (which CHECKS declared rules, where this MEASURES
  * candidate rules) and [[SchemaDiff]].
  *
  * Scale shape: each FD candidate is one (lhs → distinct-rhs) two-level
  * hash aggregate (exact distinct, no sketch) folded to a one-row
  * summary; each IND candidate is a distinct-values anti-join with the
  * parent side aggregated first (both sides key-distinct before the
  * join, so the join is value-cardinality-sized, not row-sized). All
  * integer counts — trivially engine-portable.
  */
object Dependencies {

  /** Functional-dependency audit: for each named `(lhs, rhs)` candidate,
    * one row `(fd, n_lhs, violating_lhs, max_rhs_per_lhs, holds)` —
    * `violating_lhs` = lhs values mapping to > 1 distinct rhs (nulls
    * count as a value: an lhs mapping to {x, NULL} violates). */
  def fdAudit(df: DataFrame,
              candidates: Seq[(String, Column, Column)]): DataFrame = {
    require(candidates.nonEmpty, "at least one FD candidate required")
    val frames = candidates.map { case (name, lhs, rhs) =>
      val perL = df.select(lhs.as("l"), rhs.as("r"))
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("__c"))
        .groupBy(col("l")).agg(count(lit(1)).as("nr"))
      perL.agg(count(lit(1)).as("n_lhs"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("violating_lhs"),
          max(col("nr")).as("max_rhs_per_lhs"))
        .select(lit(name).as("fd"), col("n_lhs"), col("violating_lhs"),
          col("max_rhs_per_lhs"), (col("violating_lhs") === 0).as("holds"))
    }
    frames.reduce(_ unionAll _).orderBy(col("fd"))
  }

  /** Inclusion-dependency (foreign-key) audit: for each named candidate
    * `child ⊆ parent`, one row
    * `(ind, n_child_values, missing_in_parent, coverage, holds)` over
    * DISTINCT non-null child values (`coverage` = contained fraction,
    * 6 dp). */
  def indAudit(candidates: Seq[(String, DataFrame, Column, DataFrame, Column)]): DataFrame = {
    require(candidates.nonEmpty, "at least one IND candidate required")
    val frames = candidates.map { case (name, child, ck, parent, pk) =>
      val cv = child.select(ck.as("v")).filter(col("v").isNotNull).distinct()
      val pv = parent.select(pk.as("v")).filter(col("v").isNotNull).distinct()
      val missing = cv.join(pv, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("missing_in_parent"))
      cv.agg(count(lit(1)).as("n_child_values"))
        .crossJoin(broadcast(missing))
        .select(lit(name).as("ind"), col("n_child_values"),
          col("missing_in_parent"),
          round(when(col("n_child_values") > 0,
            (col("n_child_values") - col("missing_in_parent")).cast("double") /
              col("n_child_values")).otherwise(1.0), 6).as("coverage"),
          (col("missing_in_parent") === 0).as("holds"))
    }
    frames.reduce(_ unionAll _).orderBy(col("ind"))
  }
}
