package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population Stability Index (PSI) — the standard drift monitor between
  * a baseline snapshot and a current one (feature drift before retrain,
  * corpus drift between crawls; the numeric-distribution sibling of
  * [[graft.text.CorpusStats.sourceTvDivergence]]'s token-space TV).
  *
  * Buckets are the BASELINE's equi-probable quantile cuts (exact
  * `percentile`, the q42 contract — identical cut doubles in any
  * engine); both snapshots are bucketed by `count(cuts < value)`, so
  * bucketing is a broadcast of ≤ nBuckets−1 doubles and one scan per
  * side, and the per-bucket PSI term
  * `(q − p)·ln(q/p)` (ε-floored at 1e−6 against empty buckets) is
  * computed from integer counts with one division each — engine-stable
  * up to the final ln. */
object Drift {

  /** Per-bucket drift rows `(bucket, n_base, n_cur, psi_term)`; total
    * PSI = Σ psi_term (< 0.1 stable, > 0.25 drifted by the usual rule
    * of thumb). */
  def psi(base: DataFrame, current: DataFrame, valueCol: String,
          nBuckets: Int = 10, scale: Int = 4): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = base.agg(
      expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("cuts"))
    def bucketed(df: DataFrame) = df
      .join(broadcast(cuts))
      .select(size(filter(col("cuts"), c => c < col(valueCol))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val b = bucketed(base).withColumnRenamed("n", "n_base")
    val c = bucketed(current).withColumnRenamed("n", "n_cur")
    val eps = 1e-6
    b.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .join(broadcast(b.agg(sum(col("n_base")).as("__tb"))))
      .join(broadcast(c.agg(sum(col("n_cur")).as("__tc"))))
      .withColumn("__p", greatest(col("n_base").cast("double") / col("__tb"), lit(eps)))
      .withColumn("__q", greatest(col("n_cur").cast("double") / col("__tc"), lit(eps)))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        round((col("__q") - col("__p")) * log(col("__q") / col("__p")), scale)
          .as("psi_term"))
  }

  /** EXACT 1-D Wasserstein-1 (earth-mover) distance between two numeric
    * snapshots: `W₁ = ∫|F_base − F_cur|` — the drift metric that, unlike
    * PSI/KS, weighs HOW FAR mass moved, not only how much, and needs no
    * binning at all. One row `(n_base, n_cur, w1)`.
    *
    * Exactness: on the sorted DISTINCT-value frame (values 6-dp
    * quantized), `W₁ = Σ_j gap_j·|c1_j·n2 − c2_j·n1| / (n1·n2)` with
    * cumulative counts c and value gaps as INTEGERS — every term and the
    * sum are exact DECIMAL products; the single division to doubles
    * happens once at the end (the q212 KS contract, upgraded from max to
    * a weighted sum). Scale shape: a value-keyed count aggregate, then
    * windows over the distinct-value frame only. */
  def wasserstein1(base: DataFrame, current: DataFrame, valueCol: String,
                   scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def q(df: DataFrame, arm: Int) = df.select(
      round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      lit(arm).as("arm"))
    val byV = q(base, 0).unionAll(q(current, 1))
      .groupBy(col("v"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("d1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("d2"))
    val w = Window.orderBy(col("v"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val cum = byV
      .withColumn("c1", sum(col("d1")).over(w))
      .withColumn("c2", sum(col("d2")).over(w))
      .withColumn("gap", lead(col("v"), 1).over(w) - col("v"))
      .where(col("gap").isNotNull)
    // totals from the pre-window count frame (the last distinct value's
    // row carries gap = null and is excluded from the sum — its cumsum
    // IS the total, so max-over-cum would undercount)
    val tot = byV.agg(
      sum(col("d1")).as("n_base"), sum(col("d2")).as("n_cur"))
    cum.join(broadcast(tot))
      .agg(first(col("n_base")).as("n_base"), first(col("n_cur")).as("n_cur"),
        sum(dec(col("gap")) * dec(abs(col("c1") * col("n_cur") -
          col("c2") * col("n_base")))).as("__s"))
      .select(col("n_base"), col("n_cur"),
        round(col("__s").cast("double") /
          (col("n_base").cast("double") * col("n_cur").cast("double") * 1e6),
          scale).as("w1"))
  }

  /** Jensen-Shannon divergence (in nats) between the CATEGORICAL
    * distributions of two snapshots — the symmetric, always-finite
    * sibling of KL for discrete drift (PSI needs an ε floor against
    * empty buckets; JSD doesn't: a category absent on one side
    * contributes `p/2·ln 2`, never ∞). Per-category report rows
    * `(cat, n_base, n_cur, jsd_term)` plus the corpus-level `jsd_nats`
    * total broadcast onto every row (0 = identical, ln 2 ≈ 0.693 =
    * disjoint supports).
    *
    * Scale shape: one count-aggregate per side (category-bounded), a
    * full-outer join on the category key, two broadcast scalar totals —
    * the snapshots themselves never shuffle as rows. Determinism: counts
    * are exact; each per-category term is computed in double from the
    * exact counts and quantized to a 12-dp long BEFORE the total sum, so
    * the sum is order-invariant and engine-stable. */
  def jensenShannon(base: DataFrame, current: DataFrame,
                    catCol: String, scale: Int = 6): DataFrame = {
    val b = base.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_base"))
    val c = current.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_cur"))
    val joined = b.join(c, Seq("cat"), "full_outer")
      .select(col("cat"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .join(broadcast(b.agg(sum(col("n_base")).cast("double").as("__tb"))))
      .join(broadcast(c.agg(sum(col("n_cur")).cast("double").as("__tc"))))
    val p = col("n_base").cast("double") / col("__tb")
    val q = col("n_cur").cast("double") / col("__tc")
    val m = (p + q) / 2.0
    val term = (when(col("n_base") > 0, p * log(p / m)).otherwise(0.0) +
      when(col("n_cur") > 0, q * log(q / m)).otherwise(0.0)) * 0.5
    val terms = joined.select(col("cat"), col("n_base"), col("n_cur"),
      round(term * lit(1e12)).cast("long").as("__t12"))
    val total = terms.agg(
      round(sum(col("__t12")).cast("double") / 1e12, scale).as("jsd_nats"))
    terms.join(broadcast(total))
      .select(col("cat"), col("n_base"), col("n_cur"),
        round(col("__t12").cast("double") / 1e12, scale).as("jsd_term"),
        col("jsd_nats"))
  }

  /** EMBEDDING-space drift between two snapshots of a vector corpus (the
    * vector sibling of [[psi]] / token TV: re-embedding after a model
    * swap, corpus refresh between crawls): per-dimension centroid means
    * of both snapshots, their deltas, and the cosine between the two
    * centroid vectors — the one-number "did the space move" summary.
    *
    * Determinism: per-dim means are exact 6-dp long split sums
    * ([[graft.operators.ExactAgg.davg]], order-invariant, bit-identical
    * in any engine), rounded to `scale` dp; the deltas and the centroid
    * cosine are then computed IN DOUBLE FROM THE ROUNDED MEANS — both
    * engines run identical IEEE ops on identical inputs.
    *
    * Scale shape: one posexplode + (dim)-keyed hash aggregate per
    * snapshot — dims-many groups (bounded by the embedding width), so the
    * reduce side is trivial; the cosine is an aggregate over that
    * dims-row frame, broadcast back onto it. The corpus never shuffles
    * as vectors, only as (dim, component) pairs with map-side partials. */
  def embeddingDrift(base: DataFrame, current: DataFrame, vecCol: String,
                     scale: Int = 4): DataFrame = {
    def dimMeans(df: DataFrame, out: String) = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(graft.operators.ExactAgg.davg(col("x"), scale).as(out))
    val joined = dimMeans(base, "mean_base")
      .join(dimMeans(current, "mean_cur"), Seq("dim"))
    // the three inner products are sums over only dims-many terms, but a
    // double sum is still order-dependent — quantize each term to a
    // 12-dp long (terms are products of 4-dp means, well inside the 1e6
    // headroom) so the sums are exact and the cosine double is pinned
    def qsum(c: org.apache.spark.sql.Column) =
      sum(round(c * lit(1e12)).cast("long")).cast("double") / lit(1e12)
    val cos = joined.agg(
      qsum(col("mean_base") * col("mean_cur")).as("__dot"),
      qsum(col("mean_base") * col("mean_base")).as("__na"),
      qsum(col("mean_cur") * col("mean_cur")).as("__nb"))
      .select(round(when(col("__na") > 0 && col("__nb") > 0,
        col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb")))), 6)
        .as("centroid_cos"))
    // dims-row frame × 1-row summary: the broadcast join is free and the
    // summary column makes the report self-contained per row
    joined.join(broadcast(cos))
      .select(col("dim").cast("long").as("dim"), col("mean_base"),
        col("mean_cur"),
        round(col("mean_cur") - col("mean_base"), scale).as("delta"),
        col("centroid_cos"))
  }

  /** Page-Hinkley UPWARD-drift detector (Page 1954; the sequential
    * mean-shift test the streaming-drift literature defaults to) over
    * the daily totals of `valueCol`: with `x̄_t` the running mean,
    * `m_t = Σ_{s≤t}(x_s − x̄_s − δ)` and `PH_t = m_t − min_{s≤t} m_s`;
    * the alarm fires at the first day with `PH_t > λ`. δ (drift
    * tolerance) and λ (alarm threshold) are in VALUE units. One row:
    * `(n_days, ph_max, t_alarm, drifted)` — t_alarm is the 1-based day
    * index (NULL when never). Day-bounded frame; each per-day term is
    * one pinned 6-dp long (running mean = exact prefix-sum rational),
    * so the cumulative mins/maxes compare exact integers on both
    * engines. */
  def pageHinkley(df: DataFrame, tsCol: String, valueCol: String,
                  delta: Double, lambda: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("yq"))
    val w = Window.orderBy(col("day")).rowsBetween(Long.MinValue, 0)
    val terms = daily
      .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("cs", sum(col("yq")).over(w))
      // per-day term pinned: x_t − x̄_t − δ at 6 dp (x̄_t = cs/t)
      .withColumn("term6",
        round(col("yq").cast("double") -
          col("cs").cast("double") / col("t") - lit(delta * 1e6)).cast("long"))
      .withColumn("m6", sum(col("term6")).over(w))
      .withColumn("minm6", min(col("m6")).over(w))
      .withColumn("ph6", col("m6") - col("minm6"))
    terms.agg(count(lit(1)).as("n_days"),
        round(max(col("ph6")).cast("double") / 1e6, 6).as("ph_max"),
        min(when(col("ph6") > lit(math.round(lambda * 1e6)), col("t")))
          .as("t_alarm"),
        (max(when(col("ph6") > lit(math.round(lambda * 1e6)), 1L).otherwise(0L))
          === 1L).as("drifted"))
  }
}
