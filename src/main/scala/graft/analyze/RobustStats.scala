package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Median / MAD robust outlier report — the heavy-tail-proof sibling of
  * [[Outliers.zscores]]: mean±stddev moves with the outliers it is
  * supposed to flag, median and median-absolute-deviation do not
  * (breakdown point 50%, Hampel 1974).
  *
  * Engine-portable determinism: values are 6-dp quantized longs and both
  * medians are the EXACT LOWER MEDIAN — the value at rank `(n+1) div 2`
  * under the total order `(value, tie)` — so there is no float midpoint
  * interpolation and no engine-specific percentile algorithm anywhere
  * (`percentile_approx`/`quantile_disc` disagree across engines by
  * construction).
  *
  * Scale shape: two group-keyed window sorts (value rank, then deviation
  * rank) and two small joins of the |groups|-row median frames back onto
  * the stream (broadcast — the group count is bounded). No driver
  * collection; each window partition is one group, the same shuffle key
  * reused for both passes. Skewed groups are real rows, not buffered
  * arrays.
  */
object RobustStats {

  /** Per-group trimmed mean: drop the exact `floor(n·trim)` smallest and
    * largest rows by `(value, tie)` rank and average the core — the
    * between-option of the mean (outlier-dragged) and the median
    * (information-discarding). Sums over the kept core are exact 6-dp
    * longs; one rank window per group. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String, trim: Double = 0.05): DataFrame = {
    require(trim >= 0 && trim < 0.5, s"trim out of [0, 0.5): $trim")
    val q = df.select(col(groupCol).as("g"), col(tieCol).as("tie"),
      round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val wg = Window.partitionBy(col("g")).orderBy(col("vq"), col("tie"))
    q.withColumn("rn", row_number().over(wg))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .withColumn("k", floor(col("n") * lit(trim)).cast("long"))
      .filter(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        (round(sum(col("vq")).cast("double") / 100.0 /
          count(lit(1))) / 1e4).as("trimmed_mean"))
      .orderBy(col(groupCol))
  }

  /** Exact two-sample Kolmogorov-Smirnov D between `sampleFilter` rows
    * and the rest: `D = max |F₁ − F₂|` over the pooled distinct values,
    * computed as `max |c₁·n₂ − c₂·n₁| / (n₁·n₂)` in EXACT integer
    * cross-multiplication — no float CDF ever compared. The z-scaled
    * statistic `D·√(n₁n₂/(n₁+n₂))` is reported for reference (4 dp).
    *
    * Scale shape: one (value → per-sample count) aggregate, cumulative
    * sums over the DISTINCT-value frame (single-partition window over
    * distinct values — bounded by value cardinality, not rows; quantize
    * coarser upstream if the domain is truly continuous at scale). */
  def ksTest(df: DataFrame, valueCol: String, sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("vq"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("vq"))
      .agg(sum(col("s1")).as("a1"), sum(lit(1L) - col("s1")).as("a2"))
    val w = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, 0)
    val cum = byV
      .withColumn("c1", sum(col("a1")).over(w))
      .withColumn("c2", sum(col("a2")).over(w))
    val tot = q.agg(sum(col("s1")).as("n1"),
      (count(lit(1)) - sum(col("s1"))).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("c1").cast("decimal(19,0)") * col("n2").cast("decimal(19,0)") -
          col("c2").cast("decimal(19,0)") * col("n1").cast("decimal(19,0)"))
          .as("num"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("num")).as("mx"))
      .select(col("n1"), col("n2"),
        round(col("mx").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")), 6).as("d"),
        round(col("mx").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")) *
          sqrt(col("n1").cast("double") * col("n2").cast("double") /
            (col("n1") + col("n2")).cast("double")), 4).as("ks_z"))
  }

  /** Two-sample Cramér-von Mises statistic — the WHOLE-CDF companion to
    * [[ksTest]] (KS sees only the single worst gap; CvM integrates the
    * squared gap over every pooled observation, so a distribution that
    * differs a little everywhere — the shape-drift signature KS is blind
    * to — still registers):
    * `T = Σ ct·(c₁n₂ − c₂n₁)² / (N²·n₁·n₂)` over the distinct-value
    * frame with multiplicities ct — the textbook
    * `(n₁n₂/N²)·Σ(F̂₁−F̂₂)²` with every CDF comparison cross-multiplied
    * into EXACT integers (the [[ksTest]] trick); one double division at
    * the very end. Same scale shape as KS: one corpus aggregate to the
    * distinct-value frame, one running window over it. */
  def cvmTest(df: DataFrame, valueCol: String, sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("vq"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("vq"))
      .agg(sum(col("s1")).as("a1"), sum(lit(1L) - col("s1")).as("a2"))
    val w = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, 0)
    val cum = byV
      .withColumn("c1", sum(col("a1")).over(w))
      .withColumn("c2", sum(col("a2")).over(w))
    val tot = q.agg(sum(col("s1")).as("n1"),
      (count(lit(1)) - sum(col("s1"))).as("n2"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        (d38(col("a1") + col("a2")) *
          d38(col("c1") * col("n2") - col("c2") * col("n1")) *
          d38(col("c1") * col("n2") - col("c2") * col("n1"))).as("term"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).as("s"))
      .select(col("n1"), col("n2"),
        round(col("s").cast("double") /
          ((col("n1") + col("n2")).cast("double") *
            (col("n1") + col("n2")).cast("double") *
            col("n1").cast("double") * col("n2").cast("double")), 6)
          .as("cvm_t"))
  }

  /** Per-group `(group, n, median, mad, n_outliers)` where outliers are
    * rows with `|vq − median| > cutoff · mad` in exact integer
    * arithmetic. */
  def madReport(df: DataFrame, groupCol: String, valueCol: String,
                tieCol: String, cutoff: Int = 3): DataFrame = {
    val q = df.select(col(groupCol).as("g"), col(tieCol).as("tie"),
      round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val wg = Window.partitionBy(col("g"))
    def lowerMedian(in: DataFrame, valCol: String, outCol: String): DataFrame =
      in.withColumn("__rn",
          row_number().over(wg.orderBy(col(valCol), col("tie"))))
        .withColumn("__n", count(lit(1)).over(wg))
        .filter(col("__rn") === floor((col("__n") + 1) / 2)) // integer (n+1) div 2: Spark's `/` is double division
        .select(col("g"), col(valCol).as(outCol))
    val med = lowerMedian(q, "vq", "med")
    val dev = q.join(broadcast(med), "g")
      .withColumn("dev", abs(col("vq") - col("med")))
    val mad = lowerMedian(dev.select(col("g"), col("tie"), col("dev")),
      "dev", "mad")
    dev.join(broadcast(mad), "g")
      .groupBy(col("g").as(groupCol))
      .agg(
        count(lit(1)).as("n"),
        (max(col("med")).cast("double") / 1e6).as("median"),
        (max(col("mad")).cast("double") / 1e6).as("mad"),
        sum(when(col("dev") > lit(cutoff) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col(groupCol))
  }
}
