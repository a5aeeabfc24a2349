package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** A/B experiment analysis: deterministic variant assignment + the two
  * standard significance tests a product-analytics readout runs over an
  * event stream — Welch's unequal-variance t on a per-user value metric
  * and Pearson's chi-square on the conversion 2×2 table. The decision
  * layer downstream of the funnel/retention family (reference anchor:
  * the per-class count aggregations of `process_logs_v10.py` §counts,
  * taken to inference).
  *
  * Determinism contract (what makes this SQL-oracle-able):
  *  - variant assignment is the PORTABLE md5 unit hash
  *    ([[Sharding.hash32]] mod 2) of the unit id — any engine, any rerun,
  *    any partitioning recomputes the identical A/B membership (an engine
  *    RNG would not survive a resume, let alone a cross-engine audit);
  *  - each user's metric is an exact 6-dp long sum of the metric events'
  *    values ([[graft.operators.ExactAgg]]'s quantization), so the
  *    per-user double is bit-identical everywhere;
  *  - across users, moments come from exact DECIMAL(18,6) sums of m and
  *    m² (the [[Outliers]] contract — (18,6)² stays inside every
  *    engine's 38-digit decimal cap), with the Welch/chi-square formulas
  *    applied in double only at the very end over identical inputs.
  *
  * Scale shape: one user-keyed hash aggregate folds the event scan to a
  * per-user (variant, metric, converted) frame — the only corpus-sized
  * shuffle; the variant rollup is 2 rows, and the test statistics are a
  * driver-free 1×1 cross of those two rows. Nothing here grows with the
  * event count except the first aggregate.
  */
object Experiment {

  /** Per-user experiment frame: `(user, variant, metric, converted)`.
    * `metricFilter` selects the metric-bearing events (their `valueCol`
    * sums into the per-user metric, exact at 6 dp); `convFilter` defines
    * conversion (any matching event). Users appear iff they have any
    * event — the enrolled population. */
  def perUnit(events: DataFrame, userCol: String, valueCol: String,
              metricFilter: Column, convFilter: Column): DataFrame = {
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    events.groupBy(col(userCol).as("unit"))
      .agg(
        (sum(when(metricFilter, v6).otherwise(0L)).cast("double") / 1e6)
          .as("metric"),
        max(when(convFilter, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(Sharding.hash32(col("unit")) % 2 === 0, "A").otherwise("B"))
  }

  /** One-row experiment readout: per-variant n / conversions / rates /
    * metric means, Welch's t on the metric, chi-square on conversion.
    * Rates and statistics rounded to 4 dp (presentation); the inputs to
    * every formula are exact. */
  def abReport(events: DataFrame, userCol: String, valueCol: String,
               metricFilter: Column, convFilter: Column): DataFrame = {
    val units = perUnit(events, userCol, valueCol, metricFilter, convFilter)
    val m = col("metric").cast("decimal(18,6)")
    val stats = units.groupBy(col("variant")).agg(
      count(lit(1)).as("n"),
      sum(col("converted")).as("conv"),
      sum(m).cast("double").as("sx"),
      sum(m * m).cast("double").as("sxx"))
    val a = stats.filter(col("variant") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"),
        col("sx").as("sx_a"), col("sxx").as("sxx_a"))
    val b = stats.filter(col("variant") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"),
        col("sx").as("sx_b"), col("sxx").as("sxx_b"))
    def mean(sx: Column, n: Column): Column = sx / n
    // sample variance by the two-pass identity, guarded for n <= 1 (ANSI
    // division; a one-user arm has no variance, so Welch t goes null)
    def svar(sxx: Column, sx: Column, n: Column): Column =
      when(n > 1, (sxx - sx * sx / n) / (n - 1))
    val va = svar(col("sxx_a"), col("sx_a"), col("n_a"))
    val vb = svar(col("sxx_b"), col("sx_b"), col("n_b"))
    val se2 = va / col("n_a") + vb / col("n_b")
    // chi-square over the 2x2 (variant x converted) table in exact long
    // arithmetic until the final division; degenerate margins (all
    // converted / none converted) make the statistic null, not 0/0
    val n = col("n_a") + col("n_b")
    val convTot = col("conv_a") + col("conv_b")
    val nonTot = n - convTot
    val det = (col("conv_a") * (col("n_b") - col("conv_b")) -
      col("conv_b") * (col("n_a") - col("conv_a"))).cast("double")
    val chiDen = (col("n_a") * col("n_b")).cast("double") *
      (convTot * nonTot).cast("double")
    a.crossJoin(b).select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(col("conv_a").cast("double") / col("n_a"), 4).as("rate_a"),
      round(col("conv_b").cast("double") / col("n_b"), 4).as("rate_b"),
      round(mean(col("sx_a"), col("n_a")), 4).as("mean_a"),
      round(mean(col("sx_b"), col("n_b")), 4).as("mean_b"),
      round(when(se2 > 0,
        (mean(col("sx_a"), col("n_a")) - mean(col("sx_b"), col("n_b"))) /
          sqrt(se2)), 4).as("welch_t"),
      round(when(chiDen > 0, n.cast("double") * det * det / chiDen), 4)
        .as("chi2"))
  }
}
