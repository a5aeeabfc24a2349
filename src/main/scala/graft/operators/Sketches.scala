package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB answers to questions
  * whose exact forms need a full shuffle of distinct values.
  *
  * All built-ins (HLL++ and quantile sketches are native Catalyst
  * aggregates with map-side partial merge): an approx distinct count over
  * 100 TB moves kilobytes of sketch per partition instead of the distinct
  * key set; exact `countDistinct` moves the keys.
  */
object Sketches {

  /** Per-key approximate distinct count (HyperLogLog++). `rsd` is the
    * target relative standard deviation (default 5%). */
  def approxDistinctPerKey(df: DataFrame, keyCol: String, valueCol: String,
                           rsd: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate quantiles via the native percentile_approx sketch. */
  def approxQuantilesPerKey(df: DataFrame, keyCol: String, valueCol: String,
                            quantiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(keyCol))
      .agg(percentile_approx(col(valueCol),
        array(quantiles.map(lit): _*), lit(accuracy)).as("quantiles"))
}
