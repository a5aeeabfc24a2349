package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling (the ANALYZE-TABLE surface): per-column null counts and
  * exact distinct cardinalities for ANY input schema — the first thing a
  * pipeline runs against a new corpus drop, and the freshness check it
  * runs against every snapshot after.
  *
  * Dynamic-schema operator: the column list comes from the input's
  * resolved schema at plan time (same contract as the reference's
  * data-dependent pivot columns). One aggregation pass — with
  * `exact = true` Catalyst plans the multi-distinct via Expand (one
  * input replica per distinct column), which is the exact-answer cost;
  * `exact = false` swaps in `approx_count_distinct` (HyperLogLog++,
  * ±~2.3% default rsd): ONE input replica total, bounded sketch state
  * through the shuffle — the 100 TB path, where a k-column exact
  * profile would scan-amplify the corpus k×. */
object Profile {

  def tableStats(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    def distinctAgg(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      distinctAgg(c).as(s"${c}__distinct")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Equi-width histogram of a numeric column, optionally per group —
    * the distribution half of the profile (the shape check behind every
    * "does this feature look sane" glance, and the visual sibling of
    * [[Drift.psi]]'s quantile buckets).
    *
    * Engine-exact binning: values are quantized to 6-dp longs (the
    * [[graft.operators.ExactAgg]] contract), the global [min, max] comes
    * from those longs, and the bin index is
    * `((vq − minq) · nBins) div (maxq − minq + 1)` — PURE INTEGER
    * arithmetic, so a boundary value lands in the same bin in every
    * engine (a float `(v−min)/width` floor flips boundary rows by an
    * ulp), and the `+1` denominator keeps the maximum inside bin
    * `nBins−1` with no clamp. Bin edges are presentation doubles.
    *
    * Scale shape: the [min, max] frame is a 1-row aggregate broadcast
    * back; the histogram is one (group, bin)-keyed hash aggregate with
    * map-side partials — ≤ |groups|·nBins rows regardless of corpus
    * size. */
  def equiWidthHistogram(df: DataFrame, valueCol: String, nBins: Int,
                         groupCols: Seq[String] = Nil): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val vq = round(col(valueCol) * lit(1000000)).cast("long")
    val bounds = df.agg(min(vq).as("__minq"), max(vq).as("__maxq"))
    val span = col("__maxq") - col("__minq") + lit(1L)
    val bin = call_function("div", (vq - col("__minq")) * lit(nBins.toLong), span)
    val keys = groupCols.map(col) :+ bin.as("bin")
    df.join(broadcast(bounds))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        // every row of a (group, bin) cell shares minq/maxq — first() is
        // deterministic here and keeps the edges without a rejoin
        first(col("__minq")).as("__minq"), first(col("__maxq")).as("__maxq"))
      // edges are integer-derived longs cast to double — identical IEEE
      // division in every engine, no fractional-scale round to drift
      .withColumn("bin_lo", (col("__minq") +
        call_function("div", (col("__maxq") - col("__minq") + 1L) * col("bin"),
          lit(nBins.toLong))).cast("double") / lit(1000000.0))
      .withColumn("bin_hi", (col("__minq") +
        call_function("div", (col("__maxq") - col("__minq") + 1L) * (col("bin") + 1),
          lit(nBins.toLong))).cast("double") / lit(1000000.0))
      .drop("__minq", "__maxq")
  }
}
