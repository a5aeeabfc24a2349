package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-dominance) operator — the multi-objective "best
  * trade-offs" query (Börzsönyi et al. 2001): keep every row no other
  * row beats on BOTH maximized dimensions (≥ on both, > on at least
  * one). The classic DB formulation is a quadratic NOT-EXISTS self-join;
  * in 2-D dominance collapses to a staircase test — an x-group survives
  * iff no strictly-higher-x group reaches its best y, and within a
  * group only best-y rows survive.
  *
  * Scale shape: the corpus-sized work is ONE (x)-keyed max-aggregate
  * (map-side combined); the ordered staircase pass runs on the
  * DISTINCT-X frame only (the q213/q214 rank-stats contract — windows
  * over value frames, never raw rows), and survivors re-attach by an
  * (x, y) equi-join. No self-join, no quadratic term anywhere.
  *
  * Determinism: both dimensions are 6-dp-quantized longs; dominance
  * compares exact integers. Duplicate (x, y) points are all kept (none
  * strictly dominates its twin) — the standard skyline convention. */
object Skyline {

  /** Skyline rows maximizing (`xCol`, `yCol`): input rows (projected to
    * `keep` + the two quantized dims) that no other row dominates.
    * Ordered by x desc, then the first keep column. */
  def skyline2dMax(df: DataFrame, xCol: Column, yCol: Column,
                   keep: Seq[(String, Column)]): DataFrame = {
    require(keep.nonEmpty, "need at least one carried key column")
    val base = df.select((keep.map { case (n, c) => c.as(n) } ++ Seq(
      round(xCol * lit(1000000)).cast("long").as("x_q"),
      round(yCol * lit(1000000)).cast("long").as("y_q"))): _*)
    val grp = base.groupBy(col("x_q")).agg(max(col("y_q")).as("__ymax"))
    // staircase over the distinct-x frame: a group is dominated iff some
    // strictly-higher-x group reaches ≥ its best y. The frame is ONE ROW
    // PER x (it's a groupBy-x frame), so "strictly higher x" is exactly
    // the preceding rows under a DESC sort — a RUNNING (accumulative,
    // O(n)) rows-frame. The suffix-range formulation
    // (RANGE 1 FOLLOWING → UNBOUNDED FOLLOWING) is semantically equal but
    // plans as Spark's from-scratch-per-row UnboundedFollowing frame —
    // O(n²), measured 335 s vs 1 s at sf0.1.
    val wHi = Window.orderBy(col("x_q").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val surv = grp
      .withColumn("__hiY", max(col("__ymax")).over(wHi))
      .where(col("__hiY").isNull || col("__hiY") < col("__ymax"))
      .select(col("x_q"), col("__ymax").as("y_q"))
    base.join(surv, Seq("x_q", "y_q"), "left_semi")
      .select((keep.map(k => col(k._1)) ++ Seq(col("x_q"), col("y_q"))): _*)
      .orderBy(desc("x_q"), col(keep.head._1))
  }
}
