package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overflow a single reducer.
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; salting
  * is the PLAN-level tool for the cases AQE can't fix (broadcast-disabled
  * environments, aggregations on skewed keys, deterministic layout needs):
  * the fact side's key is diversified with a deterministic salt in
  * [0, nSalts), and the dimension side is replicated once per salt value,
  * so a key that used to land on one reducer now spreads over `nSalts`.
  *
  * The salt is `pmod(hash(factKey, monotonic row id), nSalts)` — spread is
  * uniform per ROW, not per key, and requires no data statistics.
  */
object Skew {

  /** Equi-join `fact.factKey === dim.dimKey` with the dim side replicated
    * `nSalts` times. Result columns = fact columns ++ dim columns.
    *
    * Every join column is resolved against its OWN side
    * (`salted(factKey) === replicated(dimKey)`): a bare `col(factKey)`
    * would be ambiguous whenever both sides name the key identically —
    * the common case for a natural key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(col(factKey), monotonically_increasing_id()), lit(nSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
        salted(factKey) === replicated(dimKey))
      .drop("__salt")
  }

  /** Join-key SKEW REPORT — the diagnosis [[saltedJoin]] is the cure
    * for: one row of group-size statistics for a prospective join or
    * aggregation key, read before picking `nSalts` / enabling AQE skew
    * handling on a 100 TB shuffle. `skew_ratio` (max group / mean
    * group) is the headline: ~1 is uniform, ≫1 means the hottest key
    * dominates a reducer.
    *
    * Output: `(n_rows, n_keys, mean_sz, p50_sz, p99_sz, max_sz,
    * top_key, top_n, skew_ratio)` — doubles to 4 dp, `top_key` the
    * smallest key among the tied-largest groups (deterministic).
    *
    * Scale shape: one key-hash aggregate (map-side combined) shrinks
    * the corpus to one row per key; every statistic is computed on THAT
    * frame. The percentiles are the only caution: `exact = true` uses
    * the buffering exact `percentile` (fine up to ~10⁷ keys — the
    * diagnostic norm); `exact = false` swaps in `approx_percentile`
    * (mergeable GK sketch, bounded memory) for billion-key corpora —
    * the same exact/sketch toggle as [[graft.analyze.Profile]]. */
  /** [[saltedJoin]] with the salt factor chosen FROM THE DATA: the
    * fact side's max/mean key-group ratio, clamped to [1, maxSalts].
    * Ratio ≤ 2 → no salting (the plain join wins — replication is not
    * free); beyond that, salt ≈ the skew ratio so the hottest key's
    * partitions land near the mean. One cheap count-aggregate decides. */
  def autoSaltedJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     maxSalts: Int = 64): DataFrame = {
    val stats = fact.groupBy(col(factKey)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).cast("double").as("mx"),
        avg(col("n")).as("mean"))
      .head()
    val ratio = stats.getDouble(0) / math.max(stats.getDouble(1), 1e-9)
    if (ratio <= 2.0) fact.join(dim, fact(factKey) === dim(dimKey))
    else saltedJoin(fact, dim, factKey, dimKey,
      math.min(maxSalts, math.ceil(ratio).toInt))
  }

  def keyReport(df: DataFrame, keyCol: String,
                exact: Boolean = true): DataFrame = {
    def pct(p: Double): Column =
      if (exact) expr(s"percentile(c, $p)")
      else expr(s"approx_percentile(c, $p, 10000)").cast("double")
    df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        round(avg(col("c").cast("decimal(18,6)")), 4).cast("double").as("mean_sz"),
        round(pct(0.5), 4).as("p50_sz"),
        round(pct(0.99), 4).as("p99_sz"),
        max(col("c")).as("max_sz"),
        min(struct((-col("c")).as("nc"), col("k"))).as("__top"))
      .select(col("n_rows"), col("n_keys"), col("mean_sz"), col("p50_sz"),
        col("p99_sz"), col("max_sz"),
        col("__top.k").as("top_key"), (-col("__top.nc")).as("top_n"),
        // integer-exact ratio arithmetic, rounded once at the end
        round(col("max_sz") * col("n_keys").cast("double") / col("n_rows"), 4)
          .as("skew_ratio"))
  }
}
