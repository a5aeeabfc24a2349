package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Churn-label engineering: turn an event stream into supervised
  * `(user, week, churned)` training rows — "active this week, silent
  * next week" — the label-construction step upstream of the L3/L4
  * models (features come from the windowed-count family; this makes the
  * target, with the same no-leakage discipline as [[TemporalSplit]]:
  * the label for week w uses only week w+1, never the future beyond).
  *
  * Determinism: weeks are Monday-start `date_trunc` calendar arithmetic;
  * "next week active" is an integer 7-day difference on the DISTINCT
  * user-week frame — no float, no session heuristics.
  *
  * Scale shape: one (user, week) dedup of the corpus, one user-keyed
  * window (lead) over the user-weeks frame — rows = active user-weeks,
  * far below the event count. The final week is dropped (its label
  * would peek past the observation horizon — emitting it as "churned"
  * would be wrong, as censoring, not churn, ends the data).
  */
object ChurnLabels {

  /** `(user, week, n_weeks_active_so_far, churned)` — one row per active
    * user-week except each user's last observed week. */
  def weekly(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val uw = events
      .select(col(userCol).as("user"),
        date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    val horizon = uw.agg(max(col("week")).as("__h"))
    val w = Window.partitionBy(col("user")).orderBy(col("week"))
    uw
      .withColumn("n_weeks_active_so_far", row_number().over(w).cast("long"))
      .withColumn("__next", lead(col("week"), 1).over(w))
      .crossJoin(broadcast(horizon))
      // censoring guard: a user's final observed week has no label
      .filter(col("week") < col("__h"))
      .withColumn("churned",
        col("__next").isNull || datediff(col("__next"), col("week")) > 7)
      .select(col("user"), col("week"), col("n_weeks_active_so_far"),
        col("churned"))
      .orderBy(col("user"), col("week"))
  }
}
