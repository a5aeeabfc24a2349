package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-group mean/spread comparisons — one-way ANOVA (does ANY class mean
  * differ?) and the Brown-Forsythe/Levene robust spread test (do the
  * VARIANCES differ — the assumption check ANOVA itself leans on). The
  * k-arm generalization of the two-arm Welch/Cohen family in
  * [[Experiment]]: a source/segment-level readout over event or fact
  * streams ("does quality differ by source" is an ANOVA question).
  *
  * Determinism contract: values quantize to exact 2-dp longs (the
  * per-class Σ² term must survive a long at corpus row counts); per-class
  * counts and Σx, Σx² are exact DECIMAL sums, so SSB/SSW come from the
  * moment identities over exact integers with doubles entering only in
  * the final F/η² expressions — identical on any engine at any
  * partitioning. The Brown-Forsythe centering uses the LOWER MEDIAN
  * (element ⌈n/2⌉ of the sorted class — an ACTUAL data value, the
  * [[RobustStats]] portability contract; interpolated medians differ in
  * the last float ulp across engines).
  *
  * Scale shape: ANOVA is ONE class-keyed map-side-combined aggregate
  * (class-bounded output) + a 1-row rollup. Brown-Forsythe adds the
  * per-class median — a class-keyed sort window (WindowExec spills; no
  * per-class array) — then the same two aggregates over |x − med|.
  */
object VarianceTests {

  private def d19(c: Column): Column = c.cast("decimal(19,0)")
  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** One-way ANOVA over `classCol`: one row
    * `(k, n, f_stat, eta_sq)` — F = (SSB/(k−1))/(SSW/(N−k)),
    * η² = SSB/SST. NULL F when degenerate (k < 2, N ≤ k, or zero
    * within-variance). */
  def anovaF(df: DataFrame, classCol: Column, valueCol: Column): DataFrame =
    anovaOf(df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("vq")))

  /** Brown-Forsythe (median-centered Levene): ANOVA's F applied to the
    * absolute deviations from each class's lower median. Same output
    * shape `(k, n, f_stat, eta_sq)` — here F is the spread-difference
    * statistic W. */
  def leveneBF(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("xq"))
    val w = Window.partitionBy(col("cls")).orderBy(col("xq"))
    // lower median = the ⌈n/2⌉-th sorted value: an actual 2-dp long
    val med = q
      .withColumn("rn", row_number().over(w))
      .withColumn("nc", count(lit(1)).over(Window.partitionBy(col("cls"))))
      .filter(col("rn") === floor((col("nc") + 1) / 2)) // integer (n+1) div 2: Spark `/` is double division
      .select(col("cls"), col("xq").as("medq"))
    anovaOf(q.join(med, "cls")
      .select(col("cls"), abs(col("xq") - col("medq")).as("vq")))
  }

  /** Shared core over a pre-quantized `(cls, vq: long)` frame. */
  private def anovaOf(q: DataFrame): DataFrame = {
    val per = q.groupBy(col("cls"))
      .agg(count(lit(1)).as("nc"),
        sum(d19(col("vq"))).as("sc"),
        sum(d19(col("vq")) * d19(col("vq"))).as("qc"))
    per.agg(
        count(lit(1)).as("k"),
        sum(col("nc")).as("n"),
        sum(d38(col("sc"))).as("s"),
        sum(col("qc")).as("q"),
        // Σ s_c²/n_c carries the only non-integer per-class term; one
        // pinned double per class, rounded to the unit of the already
        // (2-dp)²-scaled integer space (a finer 1e6 factor overflowed
        // the long at corpus magnitudes), exactly summed
        sum(round(col("sc").cast("double") * col("sc").cast("double") /
          col("nc")).cast("long")).as("b"))
      .select(col("k"), col("n"), round({
          val n = col("n").cast("double"); val k = col("k").cast("double")
          // SSB >= 0 by identity; the unit-rounding of b can push an
          // exactly-zero SSB a hair negative — clamp (mirrored in SQL)
          val ssb = greatest(col("b").cast("double") -
            col("s").cast("double") * col("s").cast("double") / n, lit(0.0))
          val ssw = col("q").cast("double") - col("b").cast("double")
          when(col("k") >= 2 && col("n") > col("k") && ssw > 0,
            (ssb / (k - 1)) / (ssw / (n - k)))
        }, 6).as("f_stat"),
        round({
          val n = col("n").cast("double")
          val ssb = greatest(col("b").cast("double") -
            col("s").cast("double") * col("s").cast("double") / n, lit(0.0))
          val sst = col("q").cast("double") -
            col("s").cast("double") * col("s").cast("double") / n
          when(sst > 0, ssb / sst)
        }, 6).as("eta_sq"))
  }
}
