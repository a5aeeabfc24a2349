package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (Kaplan & Meier 1958) over event
  * streams with right-censoring — time-to-conversion/churn with users who
  * haven't converted YET counted correctly (the naive "mean time to
  * convert among converters" of q126 is biased low; KM is the standard
  * fix).
  *
  * Determinism: durations are integer day counts (date-boundary
  * crossings — identical calendar arithmetic on every engine); the
  * survival product multiplies IEEE doubles in the PINNED ascending-time
  * order (a left fold, bitwise identical across engines), rounded at 6 dp
  * for presentation.
  *
  * Scale shape: one user-keyed aggregate folds the corpus to a per-user
  * (duration, death) frame; the life table groups by duration (≤ study
  * span in days — hundreds of rows); the at-risk counts and survival
  * prefix-product run on single-partition windows over THAT frame, never
  * the corpus. At 100 TB the only corpus-sized operation is the first
  * aggregate.
  */
object Survival {

  /** Log-rank test (Mantel 1966) between the two portable-hash arms on
    * time-to-first-`deathFilter`: the survival-curve significance test
    * that completes the KM + experimentation stack (a mean comparison
    * ignores censoring; this doesn't). Per pooled death time:
    * `O₁ = Σd₁ₜ`, `E₁ = Σ dₜ·n₁ₜ/nₜ`,
    * `V = Σ dₜ(n₁ₜ/nₜ)(1−n₁ₜ/nₜ)(nₜ−dₜ)/(nₜ−1)`, χ² = (O₁−E₁)²/V.
    *
    * Counts are exact integers (at-risk via suffix sums over the
    * ≤study-span life table); E₁/V/χ² run in double over identical
    * integer inputs, summed after 9-dp quantization so cross-time order
    * can't drift. One user-keyed corpus aggregate; everything after is
    * frame-sized. */
  def logRank(events: DataFrame, userCol: String, tsCol: String,
              deathFilter: Column): DataFrame = {
    val u = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t0"),
        min(when(deathFilter, col(tsCol))).as("tp"),
        max(col(tsCol)).as("tl"))
      .select(
        when(graft.operators.Sharding.hash32(col(userCol)) % 2 === 0, 1L)
          .otherwise(0L).as("arm1"),
        when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
          .otherwise(datediff(col("tl"), col("t0"))).cast("long").as("dur"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("death"))
    val g = u.groupBy(col("dur").as("t"))
      .agg(count(lit(1)).as("m"), sum(col("death")).as("d"),
        sum(col("arm1")).as("m1"),
        sum(col("arm1") * col("death")).as("d1"))
    val wDesc = Window.orderBy(col("t").desc).rowsBetween(Long.MinValue, 0)
    val r = g
      .withColumn("nt", sum(col("m")).over(wDesc))
      .withColumn("n1t", sum(col("m1")).over(wDesc))
      .filter(col("d") > 0)
    val terms = r.select(
      col("d1"),
      round(col("d").cast("double") * col("n1t") / col("nt") * lit(1e9))
        .cast("long").as("e9"),
      round({
        val p = col("n1t").cast("double") / col("nt")
        when(col("nt") > 1,
          col("d").cast("double") * p * (lit(1.0) - p) *
            (col("nt") - col("d")).cast("double") / (col("nt") - 1))
          .otherwise(lit(0.0)) * lit(1e9)
      }).cast("long").as("v9"))
    terms.agg(
        sum(col("d1")).as("o1"),
        sum(col("e9")).as("se9"), sum(col("v9")).as("sv9"))
      .select(col("o1"),
        round(col("se9").cast("double") / 1e9, 4).as("e1"),
        round({
          val diff = col("o1").cast("double") - col("se9").cast("double") / 1e9
          val v = col("sv9").cast("double") / 1e9
          when(v > 0, diff * diff / v)
        }, 4).as("chi2"))
  }

  /** Life table `(t, d, n_risk, surv)` for time-to-first-`deathFilter`
    * event, censored at the user's last event: one row per duration with
    * ≥1 death, `surv` = Π_{t'≤t} (1 − d/n_risk). */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  deathFilter: Column): DataFrame = {
    val u = events.groupBy(col(userCol))
      .agg(
        min(col(tsCol)).as("t0"),
        min(when(deathFilter, col(tsCol))).as("tp"),
        max(col(tsCol)).as("tl"))
    val durs = u.select(
      when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
        .otherwise(datediff(col("tl"), col("t0"))).cast("long").as("dur"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("death"))
    val g = durs.groupBy(col("dur").as("t"))
      .agg(count(lit(1)).as("m"), sum(col("death")).as("d"))
    // at-risk at t = everyone with duration ≥ t: suffix sum over the
    // (≤ study-span)-row life table — single-partition window by design
    val wDesc = Window.orderBy(col("t").desc).rowsBetween(Long.MinValue, 0)
    val r = g.withColumn("n_risk", sum(col("m")).over(wDesc))
      .filter(col("d") > 0)
    val wAsc = Window.orderBy(col("t")).rowsBetween(Long.MinValue, 0)
    // ascending-time left fold of the factors — collect_list over an
    // ordered frame preserves frame order, so the product order is pinned
    r.withColumn("__fs",
        collect_list(lit(1.0) - col("d").cast("double") / col("n_risk"))
          .over(wAsc))
      .select(col("t"), col("d"), col("n_risk"),
        round(aggregate(col("__fs"), lit(1.0), (a, x) => a * x), 6).as("surv"))
      .orderBy(col("t"))
  }

  /** Nelson-Aalen cumulative-hazard life table — [[kaplanMeier]]'s
    * additive sibling (`Ĥ(t) = Σ_{t'≤t} d/n_risk`, with the Breslow
    * survival `exp(−Ĥ)`): better small-sample behavior for the hazard
    * itself, and the quantity hazard-ratio models calibrate against.
    * Same per-user time-to-first-event fold and censoring convention as
    * [[kaplanMeier]]; each per-time increment `d/n_risk` is pinned once
    * to a 9-dp long, so the cumulative sum is exact integer arithmetic.
    * Per death time: `(t, d, n_risk, cum_haz, na_surv)` (6 dp),
    * ordered by t. Scale: one user-keyed corpus aggregate; the life
    * table is study-span-bounded. */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String,
                  deathFilter: Column): DataFrame = {
    val u = events.groupBy(col(userCol))
      .agg(
        min(col(tsCol)).as("t0"),
        min(when(deathFilter, col(tsCol))).as("tp"),
        max(col(tsCol)).as("tl"))
    val durs = u.select(
      when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
        .otherwise(datediff(col("tl"), col("t0"))).cast("long").as("dur"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("death"))
    val g = durs.groupBy(col("dur").as("t"))
      .agg(count(lit(1)).as("m"), sum(col("death")).as("d"))
    val wDesc = Window.orderBy(col("t").desc).rowsBetween(Long.MinValue, 0)
    val r = g.withColumn("n_risk", sum(col("m")).over(wDesc))
      .filter(col("d") > 0)
      .withColumn("__h9",
        round(col("d").cast("double") / col("n_risk") * lit(1e9)).cast("long"))
    val wAsc = Window.orderBy(col("t")).rowsBetween(Long.MinValue, 0)
    r.withColumn("__ch9", sum(col("__h9")).over(wAsc))
      .select(col("t"), col("d"), col("n_risk"),
        round(col("__ch9").cast("double") / 1e9, 6).as("cum_haz"),
        round(exp(-col("__ch9").cast("double") / 1e9), 6).as("na_surv"))
      .orderBy(col("t"))
  }

  /** Restricted mean survival time at horizon `tau` (days): the area
    * under the [[kaplanMeier]] step curve on [0, τ] — the
    * censoring-honest "average days survived in the first τ" that a
    * naive mean of durations cannot give (Royston & Parmar 2013). The
    * KM curve is integrated exactly as a step function: the [0, t₁)
    * interval at S = 1 plus `Σ S(t_i)·(min(t_{i+1},τ) − t_i)`; each
    * interval term is pinned to a 9-dp long off the 6-dp-pinned KM
    * survival, so the sum is exact integer arithmetic. One row:
    * `(tau, n_deaths, rmst_days)` at 4 dp. Scale: the integral runs on
    * the life table (study-span-bounded), inheriting [[kaplanMeier]]'s
    * one corpus aggregate. */
  def rmst(events: DataFrame, userCol: String, tsCol: String,
           deathFilter: Column, tau: Int): DataFrame = {
    require(tau > 0, s"need tau > 0: $tau")
    val km = kaplanMeier(events, userCol, tsCol, deathFilter)
    val w = Window.orderBy(col("t"))
    val stepped = km.filter(col("t") < tau)
      .withColumn("tn",
        least(coalesce(lead(col("t"), 1).over(w), lit(tau.toLong)),
          lit(tau.toLong)))
      .withColumn("c9",
        round(col("surv") * (col("tn") - col("t")) * lit(1e9)).cast("long"))
    val head = km.agg(
      coalesce(least(min(col("t")), lit(tau.toLong)), lit(tau.toLong))
        .as("t1"),
      coalesce(sum(col("d")), lit(0L)).as("nd"))
    head.crossJoin(stepped.agg(coalesce(sum(col("c9")), lit(0L)).as("s9")))
      .select(lit(tau.toLong).as("tau"), col("nd").as("n_deaths"),
        round((col("t1").cast("double") * 1e9 + col("s9")) / 1e9, 4)
          .as("rmst_days"))
  }

  /** Mean cumulative function for RECURRENT events (Nelson's MCF): the
    * expected cumulative number of events per unit by day t, with
    * staggered follow-up handled exactly like [[nelsonAalen]]'s risk
    * sets — but counting EVERY qualifying event, not just the first
    * (repeat purchases, repeat incidents). Per user, events land at
    * `datediff(event, first_seen)` and follow-up ends at the last
    * observed day; `MCF(t) = Σ_{s≤t} d(s)/n_risk(s)` with
    * `n_risk(s)` = users whose follow-up covers day s. Each increment
    * is pinned to a 9-dp long. Per event day:
    * `(t, d, n_risk, mcf)` (6 dp), ordered by t. Scale: two user-keyed
    * corpus aggregates; windows run on the study-span-bounded day
    * frame. */
  def mcf(events: DataFrame, userCol: String, tsCol: String,
          eventFilter: Column): DataFrame = {
    val u = events.groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("t0"), max(col(tsCol)).as("tl"))
    val fu = u.select(datediff(col("tl"), col("t0")).cast("long").as("fu"))
      .groupBy(col("fu")).agg(count(lit(1)).as("m"))
    val ev = events.filter(eventFilter)
      .select(col(userCol).as("u"), col(tsCol).as("te"))
      .join(u, "u")
      .select(datediff(col("te"), col("t0")).cast("long").as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("d"))
    // n_risk(t) = users with follow-up ≥ t: suffix-sum the follow-up
    // histogram over the UNION of follow-up and event days, so every
    // event day reads its exact risk count — all frames day-bounded
    val days = ev.select(col("t"))
      .union(fu.select(col("fu").as("t"))).distinct()
    val wSuf = Window.orderBy(col("t").desc).rowsBetween(Long.MinValue, 0)
    val riskAt = days
      .join(fu.select(col("fu").as("t"), col("m")), Seq("t"), "left")
      .na.fill(0L, Seq("m"))
      .withColumn("n_risk", sum(col("m")).over(wSuf))
    val table = ev.join(riskAt.select(col("t"), col("n_risk")), "t")
      .withColumn("__h9",
        round(col("d").cast("double") / col("n_risk") * lit(1e9))
          .cast("long"))
    val wAsc = Window.orderBy(col("t")).rowsBetween(Long.MinValue, 0)
    table.withColumn("__c9", sum(col("__h9")).over(wAsc))
      .select(col("t"), col("d"), col("n_risk"),
        round(col("__c9").cast("double") / 1e9, 6).as("mcf"))
      .orderBy(col("t"))
  }

  /** Weibull shape/scale fit by MEDIAN-RANK REGRESSION (the probability-
    * plot method — closed form, no MLE iteration): over UNCENSORED
    * time-to-event durations only (documented; censoring-aware fits are
    * MLE territory), OLS of `y = ln(−ln(1−F̂))` on `x = ln(t)` with
    * Bénard's median ranks `F̂ᵢ = (i−0.3)/(n+0.4)` — slope = shape k,
    * `scale = exp(−intercept/k)`. Zero-duration deaths are excluded
    * (ln 0; same-day conversion carries no duration information).
    *
    * Exactness: per-observation ranks come from the distinct-duration
    * life table (cumulative counts + an in-row `sequence` explode —
    * the frame returns to observation size, never a row-scale window);
    * x and y are pinned to 9-dp longs per observation, moments are
    * exact DECIMAL sums, the OLS closed form is one double expression.
    * One row: `(n_events, shape, scale)` at 4 dp. */
  def weibullFit(events: DataFrame, userCol: String, tsCol: String,
                 deathFilter: Column): DataFrame = {
    val durs = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t0"),
        min(when(deathFilter, col(tsCol))).as("tp"))
      .where(col("tp").isNotNull)
      .select(datediff(col("tp"), col("t0")).cast("long").as("dur"))
      .where(col("dur") > 0)
    val g = durs.groupBy(col("dur").as("t")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("t")).rowsBetween(Long.MinValue, -1)
    val ranked = g.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
    val n = durs.count()
    val obs = ranked
      .select(col("t"), explode(sequence(col("cb") + 1, col("cb") + col("c")))
        .as("i"))
      .select(
        round(log(col("t").cast("double")) * lit(1e9)).cast("long").as("x9"),
        round(log(-log(lit(1.0) -
          (col("i").cast("double") - 0.3) / (n + 0.4))) * lit(1e9))
          .cast("long").as("y9"))
    def d(c: Column) = c.cast("decimal(38,0)")
    obs.agg(count(lit(1)).as("n_events"),
        sum(d(col("x9"))).as("sx"), sum(d(col("y9"))).as("sy"),
        sum(d(col("x9")) * d(col("x9"))).as("sxx"),
        sum(d(col("x9")) * d(col("y9"))).as("sxy"))
      .select(Seq(col("n_events")) ++ {
        val nn = col("n_events").cast("double")
        val sx = col("sx").cast("double") / 1e9
        val sy = col("sy").cast("double") / 1e9
        val sxx = col("sxx").cast("double") / 1e18
        val sxy = col("sxy").cast("double") / 1e18
        val den = nn * sxx - sx * sx
        val k = (nn * sxy - sx * sy) / den
        val b = (sy - k * sx) / nn
        Seq(round(when(den > 0, k), 4).as("shape"),
          round(when(den > 0, exp(-b / k)), 4).as("scale"))
      }: _*)
  }
}
