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

  /** Per-group QUANTILE NORMALIZATION onto the global distribution: each
    * row's value is replaced by the GLOBAL value at the same within-group
    * quantile — the rank-based calibration that makes per-source scores
    * comparable before a single global cut (one source's lenient scorer
    * would otherwise eat another's budget; the cross-source
    * score-calibration step upstream of [[cut]]).
    *
    * Engine-exact by integer ranks: within-group rank `r` of `n_g` maps
    * to global sorted position `idx = 1 + round((r−1)·(N−1)/(n_g−1))`
    * with ROUND-HALF-UP IN PURE INTEGER ARITHMETIC
    * (`(2·(r−1)·(N−1) + (n_g−1)) div (2·(n_g−1))`) — no float quantile
    * interpolation to drift by an ulp between engines; a singleton group
    * maps to the global median position `(N+1) div 2`.
    *
    * Scale shape: within-group ranks are one group-hash window; the
    * global sorted index is the distributed range-shuffled row index
    * ([[graft.operators.Positional.withRowIndex]] — never a single-task
    * global window); the mapping is an equi-join on `idx` against the
    * (idx, value) frame, hash-partitioned on a dense long key. */
  /** Rank-based inverse normal transform (Blom 1958 scores) of each
    * key's total — `Φ⁻¹((r − 3/8)/(N + 1/4))` over average ranks of the
    * per-key sums: the genomics-standard "INT" that forces ANY metric
    * onto a standard normal before parametric machinery (z tests,
    * Pearson correlation) touches it. The per-key companion of
    * [[quantileNormalize]]: that maps groups onto the pooled empirical
    * distribution; this maps keys onto the GAUSSIAN one.
    *
    * Exactness: per-key totals are exact longs; doubled average ranks
    * come off the distinct-total fold, so the Blom argument
    * `(r₂ − 3/4)/(2N + 1/2)` feeds the shared
    * [[graft.functions.Probit]] with exact-integer-derived doubles;
    * equal totals get equal scores by construction. Scale: one key
    * aggregate + a distinct-value fold; the join back is key-scale,
    * shuffle-free on the broadcast rank frame when totals are few.
    * Output `(key, total, int_score)` at 6 dp, ordered by key. */
  def intTransform(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val per = df.groupBy(col(keyCol))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("tq"))
    val byV = per.groupBy(col("tq")).agg(count(lit(1)).as("ct"))
    val tot = byV.agg(sum(col("ct")).as("nn"))
    val w = Window.orderBy(col("tq")).rowsBetween(Long.MinValue, -1)
    val scored = byV
      .withColumn("r2",
        lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
      .crossJoin(broadcast(tot))
      .select(col("tq"),
        round(graft.functions.Probit.probit(
          (col("r2") - lit(0.75)) / (lit(2.0) * col("nn") + lit(0.5))), 6)
          .as("int_score"))
    per.join(scored, "tq")
      .select(col(keyCol), round(col("tq").cast("double") / 1e6, 6).as("total"),
        col("int_score"))
      .orderBy(col(keyCol))
  }

  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String,
                        outCol: String = "value_norm"): DataFrame = {
    // three consumers read the input (per-group ranks, the global index,
    // the count) — materialize it ONCE so an expensive upstream
    // projection (q144 feeds a regex quality score) never re-runs per
    // consumer (measured 2.0 s → 1.4 s at sf0.1). Callers should project
    // to the needed columns first; the materialized frame is then
    // id+group+value-narrow even at corpus scale, cheaper than three
    // scan+project passes.
    val src = df.localCheckpoint(true)
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val ranked = src
      .withColumn("__r", row_number().over(wg).cast("long"))
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val globalIdx = graft.operators.Positional.withRowIndex(
        src.select(col(valueCol).as("__gv"), col(idCol).as("__gid")),
        Seq(col("__gv"), col("__gid")), "__gi")
      .select((col("__gi") + 1L).as("__idx"), col("__gv"))
    val n = src.select(count(lit(1)).as("__N"))
    val idx = when(col("__ng") > 1,
      lit(1L) + call_function("div",
        (col("__r") - 1L) * (col("__N") - 1L) * 2L + (col("__ng") - 1L),
        (col("__ng") - 1L) * 2L))
      .otherwise(call_function("div", col("__N") + 1L, lit(2L)))
    ranked.join(broadcast(n))
      .withColumn("__idx", idx)
      .join(globalIdx, Seq("__idx"))
      .withColumn(outCol, col("__gv"))
      .drop("__r", "__ng", "__N", "__idx", "__gv", "__gid")
  }
}
