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

  /** Count-min point estimates (Cormode & Muthukrishnan 2005) for a probe
    * key set, via the native `count_min_sketch` aggregate (map-side
    * mergeable — kilobytes of counters per partition cross the shuffle,
    * never the keys). The guarantee reported alongside each estimate:
    * `exact ≤ estimate ≤ exact + ε·N` with probability `confidence` —
    * one-sided overcount only, the property the spec pins.
    *
    * `probes` is driver-provided by design (a monitoring probe list is
    * configuration); the stream is aggregated ONCE into a single sketch
    * and each probe is answered from it. */
  def cmsEstimates(df: DataFrame, keyCol: String, probes: Seq[String],
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df.select(
        count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
          .as("s"))
      .head().getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    probes.map(p => (p, cms.estimateCount(p), cms.totalCount()))
      .toDF("key", "estimate", "total")
      .orderBy(col("key"))
  }
}
