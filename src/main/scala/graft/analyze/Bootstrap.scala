package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** Poisson bootstrap confidence interval (Chamandy et al. 2012, "
  * Estimating Uncertainty for Massive Data Streams" — the bootstrap that
  * actually distributes): instead of drawing n-out-of-n WITH replacement
  * (which needs global coordination), each unit enters resample `b` with
  * an independent Poisson(1) weight — for large n the two schemes
  * coincide, and the weight is a PURE FUNCTION of (unit, b) via the
  * portable md5 hash, so any engine, any partitioning, any retry
  * reproduces the identical resamples. No RNG state anywhere.
  *
  * The Poisson(1) inverse CDF is a literal ladder (cumulative
  * probabilities as 9-dp literals, capped at w = 7 — P(W > 7) < 1e-5
  * shifts a resample mean by < one unit in a million).
  *
  * Scale shape: one unit-keyed aggregate folds the corpus; the resample
  * fan-out is units×B rows of (b, w, v) feeding ONE map-side-combined
  * aggregate to B rows; the CI is a rank selection over those B rows.
  * Determinism: unit values are exact 6-dp longs, resample sums exact
  * DECIMAL, each resample mean one pinned double quantized to a 9-dp
  * long before ranking; the CI bounds are the lower-rank order
  * statistics at ⌈αB⌉ / ⌈(1−α)B⌉ — actual resample values, no
  * interpolation. */
object Bootstrap {

  /** Poisson(1) CDF ladder: P(W ≤ k) for k = 0..6 at 9 dp. */
  private val PoissonCdf: Seq[Double] = Seq(
    0.367879441, 0.735758882, 0.919698603, 0.981011843,
    0.996340153, 0.999405815, 0.999916758)

  /** 95% CI for the mean of the per-unit metric: one row
    * `(n_units, n_resamples, mean_obs, ci_lo, ci_hi)`. */
  def meanCi(events: DataFrame, unitCol: String, valueCol: String,
             metricFilter: Column, b: Int = 100): DataFrame = {
    require(b >= 40, s"need >= 40 resamples for a 95% rank CI: $b")
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    // the unit fold (a full corpus scan+aggregate) feeds both the
    // resample fan and the observed-moments branch — materialize once
    // (unit-bounded rows)
    val units = events.groupBy(col(unitCol).as("unit"))
      .agg(sum(when(metricFilter, v6).otherwise(0L)).as("vq"))
      .localCheckpoint(true)
    val spark = events.sparkSession
    val bs = spark.range(1, b + 1).select(col("id").cast("int").as("b"))
    val u = Sharding.hash32(concat(col("unit").cast("string"), lit(":"),
      col("b").cast("string"))).cast("double") / lit(4294967296.0)
    val w = PoissonCdf.zipWithIndex.foldRight(lit(7): Column) {
      case ((p, k), acc) => when(u < p, k).otherwise(acc)
    }
    val res = units.crossJoin(broadcast(bs))
      .select(col("b"), col("vq"), w.cast("long").as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("nw"),
        sum((col("w") * col("vq")).cast("decimal(38,0)")).as("sw"))
      .select(col("b"),
        round(when(col("nw") > 0,
          col("sw").cast("double") / col("nw") / 1e6) * lit(1e9))
          .cast("long").as("m9"))
      .filter(col("m9").isNotNull)
    val obs = units.agg(count(lit(1)).as("n_units"),
      sum(col("vq").cast("decimal(38,0)")).as("s"))
    val lo = math.ceil(0.025 * b).toInt
    val hi = math.ceil(0.975 * b).toInt
    val ranked = graft.operators.Positional.withRowIndex(
      res, Seq(col("m9"), col("b")), "__r")
      .select(col("m9"), (col("__r") + 1).as("r"))
    val bounds = ranked.agg(
      count(lit(1)).as("n_resamples"),
      max(when(col("r") === lo, col("m9"))).as("lo9"),
      max(when(col("r") === hi, col("m9"))).as("hi9"))
    obs.crossJoin(broadcast(bounds))
      .select(col("n_units"), col("n_resamples"),
        round(col("s").cast("double") / col("n_units") / 1e6, 6).as("mean_obs"),
        round(col("lo9").cast("double") / 1e9, 6).as("ci_lo"),
        round(col("hi9").cast("double") / 1e9, 6).as("ci_hi"))
  }

  /** BCa (bias-corrected and accelerated, Efron 1987) 95% CI for the
    * same mean — the percentile interval of [[meanCi]] with its two
    * textbook corrections: `z₀` (median bias: Φ⁻¹ of the share of
    * resample means below the observed mean) and `a` (acceleration: the
    * jackknife-skewness closed form, which for the MEAN reduces to
    * `Σ(xᵢ−x̄)³ / (6·[Σ(xᵢ−x̄)²]^{3/2})` — exact DECIMAL power sums, no
    * second resampling pass). Adjusted percentiles go through the shared
    * [[graft.functions.Phi]]/[[graft.functions.Probit]] pair, so both
    * engines move the same ranks. One row: `(n_units, n_resamples,
    * mean_obs, z0, accel, ci_lo, ci_hi)`; z0/bounds NULL when every
    * resample falls on one side of the observed mean (Φ⁻¹ undefined).
    *
    * Scale shape: [[meanCi]]'s exactly — one unit fold, a units×B
    * map-side-combined fan-in, rank selection over B rows; the three
    * power sums ride the unit fold. */
  def meanCiBca(events: DataFrame, unitCol: String, valueCol: String,
                metricFilter: Column, b: Int = 100): DataFrame = {
    require(b >= 40, s"need >= 40 resamples for a 95% rank CI: $b")
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    // the unit fold (a full corpus scan+aggregate) feeds both the
    // resample fan and the observed-moments branch — materialize once
    // (unit-bounded rows)
    val units = events.groupBy(col(unitCol).as("unit"))
      .agg(sum(when(metricFilter, v6).otherwise(0L)).as("vq"))
      .localCheckpoint(true)
    val spark = events.sparkSession
    val bs = spark.range(1, b + 1).select(col("id").cast("int").as("b"))
    val u = Sharding.hash32(concat(col("unit").cast("string"), lit(":"),
      col("b").cast("string"))).cast("double") / lit(4294967296.0)
    val w = PoissonCdf.zipWithIndex.foldRight(lit(7): Column) {
      case ((p, k), acc) => when(u < p, k).otherwise(acc)
    }
    val res = units.crossJoin(broadcast(bs))
      .select(col("b"), col("vq"), w.cast("long").as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("nw"),
        sum((col("w") * col("vq")).cast("decimal(38,0)")).as("sw"))
      .select(col("b"),
        round(when(col("nw") > 0,
          col("sw").cast("double") / col("nw") / 1e6) * lit(1e9))
          .cast("long").as("m9"))
      .filter(col("m9").isNotNull)
    def d38(c: Column) = c.cast("decimal(38,0)")
    val obs = units.agg(count(lit(1)).as("n_units"),
      sum(d38(col("vq"))).as("s1"),
      sum(d38(col("vq")) * d38(col("vq"))).as("s2"),
      sum((d38(col("vq")) * d38(col("vq"))).cast("decimal(38,0)") *
        d38(col("vq"))).as("s3"))
    // observed mean at the SAME 9-dp pin the resample means carry, so
    // the below-count comparison is long-vs-long
    val obs9 = round(col("s1").cast("double") / col("n_units") / 1e6 * lit(1e9))
      .cast("long")
    val z0p = res.crossJoin(broadcast(obs.select(obs9.as("o9"))))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("m9") < col("o9"), 1L).otherwise(0L)).as("below"))
    // corrections + adjusted ranks as one scalar row
    val consts = obs.crossJoin(broadcast(z0p)).select(
      col("n_units"), col("s1"), col("nb"),
      {
        val n = col("n_units").cast("double")
        val sx = col("s1").cast("double")
        val c2 = col("s2").cast("double") - sx * sx / n
        val c3 = col("s3").cast("double") - col("s2").cast("double") * sx / n * 3 +
          sx * sx * sx / (n * n) * 2
        when(c2 > 0, c3 / (pow(c2, 1.5) * 6.0)).otherwise(lit(0.0))
      }.as("a"),
      when(col("below") > 0 && col("below") < col("nb"),
        graft.functions.Probit.probit(
          col("below").cast("double") / col("nb"))).as("z0"))
    val zLo = lit(-1.959964); val zHi = lit(1.959964)
    def adj(zA: Column) = graft.functions.Phi.phi(
      col("z0") + (col("z0") + zA) / (lit(1.0) - col("a") * (col("z0") + zA)))
    // z0 is null when every resample fell on one side of the observed
    // mean — the BCa correction is undefined there, and the bounds must
    // be null too. The explicit isNotNull gate matters: Spark's
    // greatest() SKIPS nulls, so greatest(ceil(null*nb), 1) would
    // silently collapse the undefined rank to 1 and report the extreme
    // resample mean as a confidence bound.
    def rank(zA: Column) = when(col("z0").isNotNull,
      least(greatest(ceil(adj(zA) * col("nb")).cast("long"), lit(1L)),
        col("nb")))
    val ranks = consts.select(col("n_units"), col("s1"), col("z0"), col("a"),
      col("nb"), rank(zLo).as("rlo"), rank(zHi).as("rhi"))
    val ranked = graft.operators.Positional.withRowIndex(
      res, Seq(col("m9"), col("b")), "__r")
      .select(col("m9"), (col("__r") + 1).as("r"))
    ranked.crossJoin(broadcast(ranks))
      .agg(max(col("n_units")).as("n_units"), max(col("nb")).as("n_resamples"),
        round(max(col("s1")).cast("double") / max(col("n_units")) / 1e6, 6)
          .as("mean_obs"),
        round(max(col("z0")), 4).as("z0"),
        round(max(col("a")), 6).as("accel"),
        round(max(when(col("r") === col("rlo"), col("m9")))
          .cast("double") / 1e9, 6).as("ci_lo"),
        round(max(when(col("r") === col("rhi"), col("m9")))
          .cast("double") / 1e9, 6).as("ci_hi"))
  }
}
