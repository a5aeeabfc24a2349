package graft.analyze

import org.apache.spark.sql.DataFrame
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
