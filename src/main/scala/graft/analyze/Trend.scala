package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trend analytics over keyed time series: per-group OLS trend lines and
  * lag-1 autocorrelation — the "is this metric drifting / is it sticky"
  * readouts between the rolling windows (q122/q136) and the forecast
  * layer a pipeline hangs off them.
  *
  * Engine-portability contract (the [[Outliers]]/[[Experiment]] moment
  * discipline, extended to second-order cross terms): times are integer
  * seconds CENTERED on the group minimum, values 6-dp quantized longs;
  * every sum (Σx, Σy, Σxy, Σx², …) is an EXACT per-row long product
  * summed in DECIMAL(38,0) — within 128-bit range by construction — and
  * the closed-form slope/correlation formulas run in double only at the
  * end over bit-identical inputs, rounded at 6 dp.
  *
  * Scale shape: [[trendLines]] is ONE group-keyed hash aggregate over the
  * scan (centering needs the group min — a broadcast |groups|-row frame).
  * [[lagAutocorr]] first folds the corpus to per-(group, day) totals (the
  * only corpus-sized shuffle), then lags and moments run on the
  * days×groups frame — thousands of rows however big the input.
  */
object Trend {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Exact cross product: operands lifted to DECIMAL(19,0) FIRST so the
    * multiply runs in decimal space — a long×long per-row product would
    * silently need 2^63 < 10^19·10^19 and ANSI-throw at scale. */
  private def xprod(a: Column, b: Column): Column =
    a.cast("decimal(19,0)") * b.cast("decimal(19,0)")

  /** Per-group OLS line of `valueCol` against time:
    * `(group, n, slope_per_day, mean_val)`, slope in value-units per day
    * (6 dp). Groups with zero time variance report a null slope. */
  def trendLines(df: DataFrame, groupCol: String, tsCol: String,
                 valueCol: String): DataFrame = {
    val mins = df.groupBy(col(groupCol).as("__g"))
      .agg(min(unix_seconds(col(tsCol))).as("__t0"))
    val q = df.join(broadcast(mins), col(groupCol) <=> col("__g"))
      .select(col(groupCol),
        (unix_seconds(col(tsCol)) - col("__t0")).as("xc"),
        round(col(valueCol) * lit(1000000)).cast("long").as("yq"))
    q.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("xc"))).as("sx"),
        sum(dec(col("yq"))).as("sy"),
        sum(xprod(col("xc"), col("yq"))).as("sxy"),
        sum(xprod(col("xc"), col("xc"))).as("sxx"))
      .select(col(groupCol), col("n"),
        round({
          // guard in DOUBLE, same as the oracle: a decimal (38,0)² guard
          // product can overflow and costs far more codegen
          val den = col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")
          when(den =!= 0,
            (col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) / den *
            lit(86400.0) / lit(1000000.0))
        }, 6).as("slope_per_day"),
        round(col("sy").cast("double") / col("n") / lit(1000000.0), 6)
          .as("mean_val"))
      .orderBy(col(groupCol))
  }

  /** Lag-1 Pearson autocorrelation of the DAILY total of `valueCol` per
    * group: `(group, n_days, autocorr)` (6 dp; null when undefined).
    * Missing days are skipped, not zero-filled — compose with
    * [[graft.operators.Temporal]] gap fill when zero-filling is wanted. */
  def lagAutocorr(df: DataFrame, groupCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val daily = df.groupBy(col(groupCol),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("yq"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day"))
    val pairs = daily
      .withColumn("yprev", lag(col("yq"), 1).over(w))
      .filter(col("yprev").isNotNull)
    pairs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_days"),
        sum(dec(col("yq"))).as("sa"),
        sum(dec(col("yprev"))).as("sb"),
        sum(xprod(col("yq"), col("yprev"))).as("sab"),
        sum(xprod(col("yq"), col("yq"))).as("saa"),
        sum(xprod(col("yprev"), col("yprev"))).as("sbb"))
      .select(col(groupCol), col("n_days"),
        round({
          val n = col("n_days").cast("double")
          val cov = n * col("sab").cast("double") -
            col("sa").cast("double") * col("sb").cast("double")
          val va = n * col("saa").cast("double") -
            col("sa").cast("double") * col("sa").cast("double")
          val vb = n * col("sbb").cast("double") -
            col("sb").cast("double") * col("sb").cast("double")
          when(va > 0 && vb > 0, cov / sqrt(va * vb))
        }, 6).as("autocorr"))
      .orderBy(col(groupCol))
  }
}
