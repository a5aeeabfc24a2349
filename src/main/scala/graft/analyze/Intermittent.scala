package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Croston's method for INTERMITTENT demand (Croston 1972): per key,
  * separate exponential smoothing of the nonzero demand SIZES and of
  * the inter-demand INTERVALS; the demand-per-period forecast is their
  * ratio. The standard SES on a mostly-zero series decays toward zero
  * between demands and spikes after each one — Croston's split is the
  * classic fix for spare-parts/long-tail-SKU series.
  *
  * Exactness WITHOUT recursion or collect: with α = 1/2 the SES closed
  * form's weights `(1−α)^j` are EXACT binary powers — computed as
  * `1/(1 << j)` (no libm pow), each weighted term pinned to a 12-dp
  * long, so the per-key sums are exact and fully distributed: the
  * scale shape is one corpus fold to nonzero demand days + per-KEY
  * windows (key-series-bounded), where the [[Trend.holtLinear]]-style
  * driver recursion would collect every key. Weights below 2⁻⁵⁰ are
  * exact zeros (they round to 0 at the 12-dp pin anyway).
  *
  * Output per key with ≥ `minDemands` demand days:
  * `(key, n_demands, z_hat, p_hat, forecast)` — smoothed size, smoothed
  * interval (days), forecast = z/p (units per day), 6 dp. */
object Intermittent {

  def croston(df: DataFrame, keyCol: Column, tsCol: Column,
              qtyCol: Column, minDemands: Int = 5): DataFrame = {
    val daily = df
      .groupBy(keyCol.as("k"), to_date(tsCol).as("day"))
      .agg(sum(round(qtyCol * lit(1000000)).cast("long")).as("xq"))
      .filter(col("xq") > 0)
    val wk = Window.partitionBy(col("k")).orderBy(col("day"))
    val seq0 = daily
      .withColumn("t", row_number().over(wk))
      .withColumn("gap",
        datediff(col("day"), lag(col("day"), 1).over(wk)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("n") >= minDemands)
    // SES(α=1/2) closed form: z_n = Σ_{t≥2} x_t/2^{n−t+1} + x_1/2^{n−1};
    // weight exponents capped at 50 (exact zero beyond) — 2^e via a
    // BIGINT shift, NOT libm pow, so the weight is an exact binary power
    // on every engine
    def pin12(x: Column): Column = round(x * lit(1e12)).cast("long")
    val withE = seq0
      .withColumn("ez", when(col("t") === 1, col("n") - 1)
        .otherwise(col("n") - col("t") + 1))
      .withColumn("ep", when(col("t") === 2, col("n") - 2)
        .otherwise(col("n") - col("t") + 1))
      .withColumn("wz", when(col("ez") > 50, lit(0.0)).otherwise(
        lit(1.0) / expr("shiftleft(cast(1 as bigint), cast(ez as int))")
          .cast("double")))
      .withColumn("wp", when(col("ep") > 50, lit(0.0)).otherwise(
        lit(1.0) / expr("shiftleft(cast(1 as bigint), cast(ep as int))")
          .cast("double")))
    val terms = withE.select(col("k"), col("n"),
      // demand-size term (x in units: xq/1e6)
      pin12((col("xq").cast("double") / 1e6) * col("wz")).as("z12"),
      // interval term: gaps exist for t>=2; SES over the n−1 gaps with
      // the same closed form (first gap carries the init weight)
      when(col("t") >= 2,
        pin12(col("gap").cast("double") * col("wp"))).as("p12"))
    terms.groupBy(col("k"))
      .agg(max(col("n")).as("n_demands"), sum(col("z12")).as("z12"),
        sum(col("p12")).as("p12"))
      .select(col("k"), col("n_demands"),
        round(col("z12").cast("double") / 1e12, 6).as("z_hat"),
        round(col("p12").cast("double") / 1e12, 6).as("p_hat"),
        round(when(col("p12") > 0,
          col("z12").cast("double") / col("p12").cast("double")), 6)
          .as("forecast"))
      .orderBy(col("k"))
  }
}
