package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile-bucket filtering: rank every row inside its group
  * (e.g. per-source quality quantiles) and keep rows above a bucket
  * floor — "drop the worst 20% of every source", the standard
  * quality-cut a curation pipeline applies per domain so that one
  * low-quality source doesn't consume another's budget.
  *
  * Buckets come from `ntile` over a TOTAL order (value, then id) — an
  * integer rank computation every engine reproduces exactly, unlike a
  * float percentile threshold whose last-ulp interpolation differences
  * flip boundary rows between engines (the q42 oracle needs 4-dp
  * rounding for exactly that reason; a keep/drop flag can't be
  * rounded).
  *
  * Scale shape: one shuffle on the group key, then a range-partitioned
  * sort within groups — the same cost as any per-group window. Group
  * count is small (sources/domains), group size is huge; skewed group
  * sizes are the norm and a sort-based window handles them without
  * per-key state. For the approximate path at 100 TB,
  * [[graft.operators.Sketches]] quantiles give the same cut without
  * the sort.
  */
object QuantileCut {

  /** Assign each row its `bucket` (1..n) of `valueCol` within
    * `groupCol`, tie-broken by `idCol` for engine-independent
    * determinism, plus `keep` = 1 iff bucket > dropBuckets. */
  def buckets(df: DataFrame, groupCol: String, valueCol: String,
              idCol: String, n: Int, dropBuckets: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    df.withColumn("bucket", ntile(n).over(w))
      .withColumn("keep", (col("bucket") > dropBuckets).cast("long"))
  }

  /** The apply form: drop the lowest `dropBuckets` of `n` quantile
    * buckets per group. */
  def cut(df: DataFrame, groupCol: String, valueCol: String,
          idCol: String, n: Int = 5, dropBuckets: Int = 1): DataFrame =
    buckets(df, groupCol, valueCol, idCol, n, dropBuckets)
      .filter(col("keep") === 1L)
      .drop("bucket", "keep")

  /** Per-group WINSORIZATION: clamp `valueCol` into its group's exact
    * `[pLo, pHi]` percentile band instead of dropping rows — the outlier
    * treatment for numeric feature columns where row deletion would bias
    * the sample (loss spikes, latency tails, reward clipping).
    *
    * Exact linear-interpolation percentiles (built-in `percentile`, the
    * same semantics as DuckDB's `quantile_cont` — q42's contract): one
    * per-group sort for the cut table (small: 2 doubles per group),
    * broadcast back, clamp as a pure projection. At 100 TB the cut table
    * is the only aggregation; the clamp itself is scan-speed. The
    * approximate path swaps in [[graft.operators.Sketches]] quantiles. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double,
                outCol: String = "value_w"): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0<=pLo<pHi<=1, got $pLo,$pHi")
    val cuts = df.groupBy(col(groupCol)).agg(
      expr(s"percentile($valueCol, $pLo)").as("__lo"),
      expr(s"percentile($valueCol, $pHi)").as("__hi"))
      .withColumnRenamed(groupCol, "__g")
    // null-safe join: a null group must keep (and clamp) its rows — a
    // plain equi-join would silently drop them (see Impute)
    df.join(broadcast(cuts), col(groupCol) <=> col("__g"))
      .withColumn(outCol,
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi", "__g")
  }
}
