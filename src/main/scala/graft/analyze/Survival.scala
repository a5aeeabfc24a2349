package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (Kaplan & Meier 1958) over event
  * streams with right-censoring — time-to-conversion/churn with users who
  * haven't converted YET counted correctly (the naive "mean time to
  * convert among converters" of q126 is biased low; KM is the standard
  * fix).
  *
  * Determinism: durations are integer day counts (date-boundary
  * crossings — identical calendar arithmetic on every engine); the
  * survival product multiplies IEEE doubles in the PINNED ascending-time
  * order (a left fold, bitwise identical across engines), rounded at 6 dp
  * for presentation.
  *
  * Scale shape: one user-keyed aggregate folds the corpus to a per-user
  * (duration, death) frame; the life table groups by duration (≤ study
  * span in days — hundreds of rows); the at-risk counts and survival
  * prefix-product run on single-partition windows over THAT frame, never
  * the corpus. At 100 TB the only corpus-sized operation is the first
  * aggregate.
  */
object Survival {

  /** Life table `(t, d, n_risk, surv)` for time-to-first-`deathFilter`
    * event, censored at the user's last event: one row per duration with
    * ≥1 death, `surv` = Π_{t'≤t} (1 − d/n_risk). */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  deathFilter: Column): DataFrame = {
    val u = events.groupBy(col(userCol))
      .agg(
        min(col(tsCol)).as("t0"),
        min(when(deathFilter, col(tsCol))).as("tp"),
        max(col(tsCol)).as("tl"))
    val durs = u.select(
      when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
        .otherwise(datediff(col("tl"), col("t0"))).cast("long").as("dur"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("death"))
    val g = durs.groupBy(col("dur").as("t"))
      .agg(count(lit(1)).as("m"), sum(col("death")).as("d"))
    // at-risk at t = everyone with duration ≥ t: suffix sum over the
    // (≤ study-span)-row life table — single-partition window by design
    val wDesc = Window.orderBy(col("t").desc).rowsBetween(Long.MinValue, 0)
    val r = g.withColumn("n_risk", sum(col("m")).over(wDesc))
      .filter(col("d") > 0)
    val wAsc = Window.orderBy(col("t")).rowsBetween(Long.MinValue, 0)
    // ascending-time left fold of the factors — collect_list over an
    // ordered frame preserves frame order, so the product order is pinned
    r.withColumn("__fs",
        collect_list(lit(1.0) - col("d").cast("double") / col("n_risk"))
          .over(wAsc))
      .select(col("t"), col("d"), col("n_risk"),
        round(aggregate(col("__fs"), lit(1.0), (a, x) => a * x), 6).as("surv"))
      .orderBy(col("t"))
  }
}
