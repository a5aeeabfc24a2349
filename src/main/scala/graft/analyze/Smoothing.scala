package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over per-key event history — the
  * smoothing layer under trend/anomaly readouts (sibling of the rolling
  * mean/z-score family, SURVEY.md W2 time windows; reference anchor: the
  * windowed count features of `process_logs_v10.py` §window).
  *
  * Engine-portable by construction ("dyadic EWMA"): α = 1/2, so every
  * weight is a power of two, values are 6-dp quantized longs, and the
  * weighted numerator/denominator are EXACT integer sums — the classic
  * recursive float EWMA diverges bitwise across engines and partition
  * orders, this one cannot. The window is the trailing `depth+1` rows
  * (older contributions are < 2^-depth and are cut exactly rather than
  * approximately): weight of the lag-k value is 2^(depth-k).
  *
  * Scale shape: one range-shuffle per key (the window sort), then a single
  * codegen'd window projection — `collect_list` over a bounded 11-row
  * frame plus integer HOF arithmetic, no joins, no driver state. State per
  * row is O(depth), independent of history length.
  */
object Smoothing {

  /** Adds `ewma` (4 dp) over `valueCol`, per `keyCol`, ordered by
    * `(tsCol, tieCol)`. `depth` = number of trailing rows beyond the
    * current one (default 10 → 11-row frame, weights 2^10 … 2^0). */
  def ewmaDyadic(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCol: String,
                 depth: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 40, s"depth out of range: $depth")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-depth, Window.currentRow)
    val vq = round(col(valueCol) * lit(1000000)).cast("long")
    // 2^e as an exact long (e ≤ 41 « 53, so the double detour is exact).
    def pow2(e: Column): Column = pow(lit(2.0), e).cast("long")
    // Frame array arrives oldest→current; element i of m carries weight
    // 2^(depth+1-m+i), so the current row is 2^depth and the total is
    // 2^(depth+1) - 2^(depth+1-m) — both exact longs.
    val arr = collect_list(vq).over(w)
    val m = size(arr)
    val wsum = aggregate(
      zip_with(
        arr,
        transform(sequence(lit(0), m - 1),
          i => pow2(lit(depth + 1) - m + i)),
        (x, p) => x * p),
      lit(0L), (acc, x) => acc + x)
    val wtot = pow2(lit(depth + 1)) - pow2(lit(depth + 1) - m)
    df.withColumn("ewma",
      round(wsum.cast("double") / wtot.cast("double") / lit(1000000.0), 4))
  }

  /** Empirical-Bayes (beta-binomial, moment-matched) shrinkage of
    * per-unit conversion rates — the CTR-smoothing standard: a 1/1 user
    * must not outrank a 90/100 user, so every raw rate shrinks toward
    * the population prior by its own evidence. Prior strength comes
    * from the method of moments on the PINNED raw rates
    * (`α+β = μ(1−μ)/σ² − 1`, population variance; degenerate corpora —
    * zero rate variance — fall back to the raw rate, documented):
    * `shrunk = (x + α)/(n + α + β)`.
    *
    * Exactness: each unit's raw rate is pinned once to a 9-dp long;
    * μ/σ² come from exact integer sums of those pins; α/β and the
    * shrunken rate are single double expressions per row, 6 dp.
    * Output one row per unit: `(unit, n, x, raw_rate, shrunk_rate)`
    * ordered by unit. Scale: one unit-keyed corpus aggregate + a 1-row
    * moment broadcast; the shrink itself is scan-speed. */
  def ebShrinkRates(df: DataFrame, unitCol: Column,
                    successFilter: Column): DataFrame = {
    val per = df.groupBy(unitCol.as("unit"))
      .agg(count(lit(1)).as("n"),
        sum(when(successFilter, 1L).otherwise(0L)).as("x"))
      .withColumn("p9",
        round(col("x").cast("double") / col("n") * lit(1e9)).cast("long"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val mom = per.agg(count(lit(1)).as("m"),
      sum(d(col("p9"))).as("sp"), sum(d(col("p9")) * d(col("p9"))).as("spp"))
    per.crossJoin(broadcast(mom))
      .select(Seq(col("unit"), col("n"), col("x"),
        round(col("p9").cast("double") / 1e9, 6).as("raw_rate")) ++ {
        val m = col("m").cast("double")
        val mu = col("sp").cast("double") / 1e9 / m
        val vr = col("spp").cast("double") / 1e18 / m - mu * mu
        val s = mu * (lit(1.0) - mu) / vr - 1
        val alpha = mu * s
        val beta = (lit(1.0) - mu) * s
        Seq(round(when(vr > 0 && s > 0,
            (col("x") + alpha) / (col("n") + alpha + beta))
          .otherwise(col("p9").cast("double") / 1e9), 6).as("shrunk_rate"))
      }: _*)
      .orderBy(col("unit"))
  }
}
