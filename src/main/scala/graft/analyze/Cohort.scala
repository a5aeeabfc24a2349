package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohorted lifetime-value accumulation: revenue per acquisition cohort by
  * week-since-acquisition, with the running cumulative — the LTV curve
  * next to [[Funnel.weeklyRetention]] (retention counts users; this sums
  * what they spend).
  *
  * Determinism: cohorts and week indices are integer calendar arithmetic
  * (Monday-start `date_trunc('week')`, day-difference div 7 — identical
  * on every engine); revenue sums are exact 6-dp longs, cumulated in
  * long, unscaled once for presentation.
  *
  * Scale shape: one user-keyed aggregate (first-event cohort), one join
  * back (broadcast when the user frame allows, AQE otherwise), one
  * (cohort, week) rollup — the cumulative runs on the cohorts×weeks
  * frame, not the corpus.
  */
object Cohort {

  /** `(cohort_week, week_k, revenue, cum_revenue)` (2 dp) for
    * `revenueFilter` events. `week_k` counts whole weeks between the
    * user's cohort week and the event's week. */
  def ltvCurve(events: DataFrame, userCol: String, tsCol: String,
               valueCol: String, revenueFilter: Column): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val rev = events.filter(revenueFilter)
      .join(cohorts, userCol)
      .select(col("cohort_week"),
        floor(datediff(date_trunc("week", col(tsCol)), col("cohort_week")) / 7)
          .as("week_k"),
        round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val g = rev.groupBy(col("cohort_week"), col("week_k"))
      .agg(sum(col("vq")).as("rq"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_k"))
      .rowsBetween(Long.MinValue, 0)
    g.withColumn("cq", sum(col("rq")).over(w))
      .select(col("cohort_week"), col("week_k"),
        (round(col("rq").cast("double") / 10000.0) / 100.0).as("revenue"),
        (round(col("cq").cast("double") / 10000.0) / 100.0).as("cum_revenue"))
      .orderBy(col("cohort_week"), col("week_k"))
  }
}
