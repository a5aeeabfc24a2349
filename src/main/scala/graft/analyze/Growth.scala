package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting and RFM segmentation — the two workhorse
  * product-analytics rollups next to retention ([[Funnel]]) and LTV
  * ([[Cohort]]).
  *
  * [[dailyAccounting]]: per day, active / new / returning users and the
  * cumulative user count — "new" is defined by each user's FIRST day
  * (a min-aggregate; no per-day distinct-set bookkeeping), so the corpus
  * pays one (user, day) dedup and one user-keyed min.
  *
  * [[rfmSegments]]: recency/frequency/monetary quintiles per user with
  * EXACT integer bucket arithmetic — `bucket = (rank−1)·5 div n` under a
  * pinned `(metric, user)` total order, never `ntile` (engines split
  * remainder buckets differently). Output is the 5×5×5 segment census,
  * bounded at 125 rows however large the user base.
  */
object Growth {

  /** `(day, n_active, n_new, n_returning, cum_users)`. */
  def dailyAccounting(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val userDays = events
      .select(col(userCol).as("u"), date_trunc("day", col(tsCol)).as("day"))
      .distinct()
    val firstDay = userDays.groupBy(col("u")).agg(min(col("day")).as("fd"))
    val daily = userDays.join(firstDay, "u")
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("day") === col("fd"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
    val w = Window.orderBy(col("day")).rowsBetween(Long.MinValue, 0)
    // cumulative over the days-frame (≤ study span), not the corpus
    daily.withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy(col("day"))
  }

  /** `(r, f, m, n_users)` — quintile-coded segment census. All three
    * metrics rank ascending (higher recency-timestamp / frequency /
    * monetary → higher bucket). Global ranks come from
    * [[graft.operators.Positional.withRowIndex]] (range partition +
    * zipWithIndex) — a global `Window.orderBy` would plan a
    * SinglePartition sort wall over the whole user base; this shape
    * sorts distributed, three range shuffles total. */
  /** Half-life time-decayed popularity per group, anchored at the corpus
    * max timestamp: `score = Σ 2^(−age/halfLife)` — the trending-score
    * semantics (an event `halfLife` old counts half a fresh one).
    * Per-event decay terms are 6-dp-quantized longs, so the per-group
    * sum is exact and order-invariant; one broadcast anchor, one
    * group-bounded aggregate. `(group, n_events, decayed_score)`. */
  def decayedPopularity(events: DataFrame, groupCol: String, tsCol: String,
                        halfLifeDays: Double): DataFrame = {
    val anchor = events.agg(max(unix_micros(col(tsCol))).as("__amax"))
    events.join(broadcast(anchor))
      .select(col(groupCol).as("g"),
        round(pow(lit(2.0),
          -((col("__amax") - unix_micros(col(tsCol))).cast("double") /
            lit(86400.0e6 * halfLifeDays))) * lit(1e6)).cast("long")
          .as("__t6"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__t6")).cast("double") / 1e6, 4).as("decayed_score"))
      .select(col("g").as(groupCol), col("n_events"), col("decayed_score"))
      .orderBy(col(groupCol))
  }

  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, monetaryFilter: Column): DataFrame = {
    val per = events.groupBy(col(userCol).as("u"))
      .agg(
        max(unix_micros(col(tsCol))).as("last_ts"),
        count(lit(1)).as("freq"),
        sum(when(monetaryFilter,
          round(col(valueCol) * lit(1000000)).cast("long")).otherwise(0L))
          .as("mon"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = per.count()
    def quintiled(df: DataFrame, metric: String, out: String): DataFrame =
      graft.operators.Positional
        .withRowIndex(df, Seq(col(metric), col("u")), "__i")
        .withColumn(out, expr(s"__i * 5 div $n") + 1)
        .drop("__i")
    val coded = Seq(("last_ts", "r"), ("freq", "f"), ("mon", "m"))
      .foldLeft(per.toDF()) { case (d, (m, o)) => quintiled(d, m, o) }
    val out = coded
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("r"), col("f"), col("m"))
    out
  }
}
