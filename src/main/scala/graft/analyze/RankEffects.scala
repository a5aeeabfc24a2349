package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tie-robust two-sample rank EFFECT SIZES and the test that goes with
  * them — the answer to "the A/B delta is significant, but how BIG is
  * it, and does significance survive unequal variances?":
  *
  *  - Cliff's δ = P(X>Y) − P(X<Y) and the Vargha-Delaney
  *    A = P(X>Y) + ½P(X=Y): distribution-free effect sizes that survive
  *    heavy ties and outliers where Cohen's d (q216) assumes normal
  *    spread; banded by the Romano et al. (2006) thresholds.
  *  - Brunner-Munzel: the Behrens-Fisher-robust replacement for
  *    Mann-Whitney (q213) — MW's variance assumes the two arms share a
  *    distribution under H₀; BM estimates each arm's rank variance
  *    separately (the lawstat/R formulation), with Satterthwaite df.
  *
  * Both ride the SAME distinct-value doubled-rank fold as the rest of
  * the rank family ([[RankStats]]): ONE map-side-combinable aggregate
  * over the corpus to `(value, c1, ct)`, a distinct-value-bounded
  * cumulative window, and exact integer/DECIMAL folds — doubles only
  * in the terminal statistics. Scale: nothing after the first
  * aggregate touches corpus-sized data. */
object RankEffects {

  /** Cliff's δ and Vargha-Delaney A between `sampleFilter` rows
    * (sample 1 = X) and the rest (Y). One row
    * `(n1, n2, a_vd, cliffs_delta, magnitude)`; the doubled dominance
    * count `2·#{X>Y} + #{X=Y}` is exact, so A and δ are single exact
    * divisions. */
  def cliffsDelta(df: DataFrame, valueCol: String,
                  sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
      .withColumn("c2", col("ct") - col("c1"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val cum = byV.withColumn("c2lt", coalesce(sum(col("c2")).over(w), lit(0L)))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val agg = cum.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      // doubled U₁: 2·Σ c1(v)·(#Y below v) + Σ c1(v)·c2(v)
      sum(d38(col("c1")) * d38(col("c2lt")) * 2 + d38(col("c1")) * d38(col("c2")))
        .as("u1x2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val a = col("u1x2").cast("double") / (n1 * n2 * 2)
    val delta = (col("u1x2").cast("double") - n1 * n2) / (n1 * n2)
    val absd = abs(delta)
    agg.select(col("n1"), col("n2"),
      round(a, 6).as("a_vd"), round(delta, 6).as("cliffs_delta"),
      when(absd < 0.147, "negligible").when(absd < 0.33, "small")
        .when(absd < 0.474, "medium").otherwise("large").as("magnitude"))
  }

  /** Brunner-Munzel test between `sampleFilter` rows (sample 1) and the
    * rest: one row `(n1, n2, p_hat, w, df)` with
    * `p̂ = (R̄₂ − (n₂+1)/2)/n₁` (the relative effect P(X<Y) + ½P(X=Y)),
    * `W = n₁·n₂·(R̄₂ − R̄₁) / (N·√(n₁·v₁ + n₂·v₂))` and Satterthwaite
    * `df = (n₁v₁ + n₂v₂)² / ((n₁v₁)²/(n₁−1) + (n₂v₂)²/(n₂−1))`, where
    * `v_k` is arm k's sample variance of (overall midrank − within-arm
    * midrank). Doubled-rank differences keep every moment an exact
    * DECIMAL until the final doubles. NULL W/df when an arm is empty or
    * a variance denominator degenerates. */
  def brunnerMunzel(df: DataFrame, valueCol: String,
                    sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
      .withColumn("c2", col("ct") - col("c1"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    // doubled midranks: overall (r2) and within each arm (r2k): every
    // element at value v in arm k has overall midrank r2/2 and within-
    // arm midrank r2k/2, so the doubled placement D2_k = r2 − r2k is an
    // exact integer shared by all c_k(v) copies
    val ranked = byV
      .withColumn("r2",
        lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
      .withColumn("r21",
        lit(2) * coalesce(sum(col("c1")).over(w), lit(0L)) + col("c1") + 1)
      .withColumn("r22",
        lit(2) * coalesce(sum(col("c2")).over(w), lit(0L)) + col("c2") + 1)
    def d38(c: Column) = c.cast("decimal(38,0)")
    val agg = ranked.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum(d38(col("c1")) * d38(col("r2"))).as("sr1x2"),
      sum(d38(col("c2")) * d38(col("r2"))).as("sr2x2"),
      sum(d38(col("c1")) * d38(col("r2") - col("r21"))).as("sd1x2"),
      sum(d38(col("c2")) * d38(col("r2") - col("r22"))).as("sd2x2"),
      sum(d38(col("c1")) * d38(col("r2") - col("r21")) *
        d38(col("r2") - col("r21"))).as("sdd1x4"),
      sum(d38(col("c2")) * d38(col("r2") - col("r22")) *
        d38(col("r2") - col("r22"))).as("sdd2x4"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nn = n1 + n2
    val rbar1 = col("sr1x2").cast("double") / (n1 * 2)
    val rbar2 = col("sr2x2").cast("double") / (n2 * 2)
    // v_k = (Σc·D2² − (Σc·D2)²/n_k) / (4·(n_k − 1)), D = D2/2
    def vk(sdd: Column, sd: Column, nk: Column) =
      (sdd.cast("double") - sd.cast("double") * sd.cast("double") / nk) /
        (nk * 4 - 4)
    val v1 = vk(col("sdd1x4"), col("sd1x2"), n1)
    val v2 = vk(col("sdd2x4"), col("sd2x2"), n2)
    val pooled = n1 * v1 + n2 * v2
    agg.select(col("n1"), col("n2"),
      round((rbar2 - (n2 + 1) / 2) / n1, 6).as("p_hat"),
      round(when(col("n1") >= 2 && col("n2") >= 2 && pooled > 0,
        n1 * n2 * (rbar2 - rbar1) / (nn * sqrt(pooled))), 4).as("w"),
      round(when(col("n1") >= 2 && col("n2") >= 2 && pooled > 0,
        pooled * pooled / ((n1 * v1) * (n1 * v1) / (n1 - 1) +
          (n2 * v2) * (n2 * v2) / (n2 - 1))), 2).as("df"))
  }

  /** Ansari-Bradley scale test between `sampleFilter` rows (sample 1)
    * and the rest: do the two arms share a SPREAD (same median assumed)?
    * Scores walk in from both ends — `a(p) = min(p, N+1−p)` over pooled
    * rank positions p, tie blocks receiving their average score — so a
    * tightly-bunched sample collects LARGE scores. One row
    * `(n1, n2, ab_stat, z)` with `A = Σ_{arm1} a_i`,
    * `E = n1·ā`, `Var = n1·n2/(N(N−1))·(Σa² − N·ā²)`,
    * `z = (A − E)/√Var` — the general tie-averaged linear-rank moments.
    *
    * The fold: each distinct value is a position block `[l, r]`; its
    * score SUM has a closed triangular form on each side of the fold
    * point `K = ⌊(N+1)/2⌋` (doubled to stay integral), and the block
    * average is ONE pinned division — both engines round the identical
    * double. Everything else is exact DECIMAL. */
  def ansariBradley(df: DataFrame, valueCol: String,
                    sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val tot = Window.orderBy(col("v"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val pos = byV
      .withColumn("l", coalesce(sum(col("ct")).over(w), lit(0L)) + 1)
      .withColumn("r", coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct"))
      .withColumn("nn", sum(col("ct")).over(tot))
    // doubled block score sum T2 = 2·Σ_{p=l}^{r} min(p, N+1−p):
    // ascending part on [l, min(r,K)], descending on [max(l,K+1), r]
    val kSplit = expr("(nn + 1) div 2")
    val aHi = least(col("r"), kSplit)
    val bLo = greatest(col("l"), kSplit + 1)
    val t2 = when(aHi >= col("l"),
        (col("l") + aHi) * (aHi - col("l") + 1)).otherwise(lit(0L)) +
      when(col("r") >= bLo,
        ((col("nn") + 1) * lit(2) - bLo - col("r")) * (col("r") - bLo + 1))
        .otherwise(lit(0L))
    // block-average score doubled ×1e6, pinned: one double division of
    // identical inputs on both engines
    val scored = pos.withColumn("a6",
      round(t2.cast("double") * lit(1e6) / col("ct")).cast("long"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val agg = scored.agg(
      sum(col("c1")).as("n1"), (sum(col("ct")) - sum(col("c1"))).as("n2"),
      sum(col("ct")).as("n"),
      sum(d38(col("c1")) * d38(col("a6"))).as("sa1"),
      sum(d38(col("ct")) * d38(col("a6"))).as("sa"),
      sum(d38(col("ct")) * d38(col("a6")) * d38(col("a6")))
        .as("saa"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nD = col("n").cast("double")
    // back to single-score units: a6 = 2e6·a
    val aStat = col("sa1").cast("double") / 2e6
    val e = n1 * (col("sa").cast("double") / 2e6) / nD
    val varA = n1 * n2 / (nD * (nD - 1)) *
      (col("saa").cast("double") / 4e12 -
        (col("sa").cast("double") / 2e6) * (col("sa").cast("double") / 2e6) / nD)
    agg.select(col("n1"), col("n2"),
      round(aStat, 1).as("ab_stat"),
      round(when(col("n1") >= 1 && col("n2") >= 1 && varA > 0,
        (aStat - e) / sqrt(varA)), 4).as("z"))
  }

  /** Lepage test (Lepage 1971): the classical location-scale omnibus —
    * the sum of the squared standardized Wilcoxon (location) and
    * Ansari-Bradley (scale) statistics, `L = z_W² + z_AB² ~ χ²(2)`.
    * [[cucconi]] is the modern squared-rank alternative; shipping both
    * lets either side of a regression be attributed (L's two z's are
    * reported separately). ONE distinct-value fold feeds both
    * statistics: doubled midranks for W (tie-corrected variance, as
    * q213), triangular tie-averaged scores for AB (as q367). One row
    * `(n1, n2, z_w, z_ab, lepage)`. */
  def lepage(df: DataFrame, valueCol: String,
             sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val tot = Window.orderBy(col("v"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val pos = byV
      .withColumn("r2",
        lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
      .withColumn("l", coalesce(sum(col("ct")).over(w), lit(0L)) + 1)
      .withColumn("r", coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct"))
      .withColumn("nn", sum(col("ct")).over(tot))
    val kSplit = expr("(nn + 1) div 2")
    val aHi = least(col("r"), kSplit)
    val bLo = greatest(col("l"), kSplit + 1)
    val t2 = when(aHi >= col("l"),
        (col("l") + aHi) * (aHi - col("l") + 1)).otherwise(lit(0L)) +
      when(col("r") >= bLo,
        ((col("nn") + 1) * lit(2) - bLo - col("r")) * (col("r") - bLo + 1))
        .otherwise(lit(0L))
    val scored = pos.withColumn("a6",
      round(t2.cast("double") * lit(1e6) / col("ct")).cast("long"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val agg = scored.agg(
      sum(col("c1")).as("n1"), (sum(col("ct")) - sum(col("c1"))).as("n2"),
      sum(col("ct")).as("n"),
      sum(d38(col("c1")) * d38(col("r2"))).as("r1x2"),
      sum(d38(col("ct")) * d38(col("ct")) * d38(col("ct")) -
        d38(col("ct"))).as("tie3"),
      sum(d38(col("c1")) * d38(col("a6"))).as("sa1"),
      sum(d38(col("ct")) * d38(col("a6"))).as("sa"),
      sum(d38(col("ct")) * d38(col("a6")) * d38(col("a6"))).as("saa"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nD = col("n").cast("double")
    // Wilcoxon z, tie-corrected (the q213 formulation)
    val u1 = col("r1x2").cast("double") / 2.0 - n1 * (n1 + 1) / 2.0
    val vW = n1 * n2 / 12.0 *
      ((nD + 1) - col("tie3").cast("double") / (nD * (nD - 1)))
    val zW = (u1 - n1 * n2 / 2.0) / sqrt(vW)
    // Ansari-Bradley z (the q367 formulation)
    val aStat = col("sa1").cast("double") / 2e6
    val e = n1 * (col("sa").cast("double") / 2e6) / nD
    val vA = n1 * n2 / (nD * (nD - 1)) *
      (col("saa").cast("double") / 4e12 -
        (col("sa").cast("double") / 2e6) * (col("sa").cast("double") / 2e6) / nD)
    val ok = col("n1") >= 1 && col("n2") >= 1
    agg.select(col("n1"), col("n2"),
      round(when(ok && vW > 0, zW), 4).as("z_w"),
      round(when(ok && vA > 0, (aStat - e) / sqrt(vA)), 4).as("z_ab"),
      round(when(ok && vW > 0 && vA > 0,
        zW * zW + ((aStat - e) / sqrt(vA)) * ((aStat - e) / sqrt(vA))), 4)
        .as("lepage"))
  }

  /** Cucconi test (Cucconi 1968; Marozzi 2009's modern treatment) —
    * the JOINT location-scale two-sample test: detects a shift, a
    * spread change, or both, where Mann-Whitney sees only location and
    * Ansari-Bradley only scale. Midranks for ties (the practical
    * convention; documented).
    *
    * With `S_R = Σ_{arm1} R_i²` and `S_C = Σ_{arm1} (N+1−R_i)²`:
    * `U = (6S_R − n₁(N+1)(2N+1)) / √(n₁n₂(N+1)(2N+1)(8N+11)/5)`,
    * `V` the same off S_C, `ρ = 2(N²−4)/((2N+1)(8N+11)) − 1`,
    * `C = (U² + V² − 2ρUV) / (2(1−ρ²))` — large C rejects. One row
    * `(n1, n2, u, v, c_stat)`.
    *
    * Exactness: doubled midranks make 4·S_R and 4·S_C exact DECIMAL
    * sums (`Σ c₁·r2²` and `Σ c₁·(2(N+1)−r2)²`); every moment in U, V,
    * ρ is integer-derived; doubles only in the closing algebra. */
  def cucconi(df: DataFrame, valueCol: String,
              sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val tot = Window.orderBy(col("v"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val ranked = byV
      .withColumn("r2",
        lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
      .withColumn("nn", sum(col("ct")).over(tot))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val agg = ranked.agg(
      sum(col("c1")).as("n1"), (sum(col("ct")) - sum(col("c1"))).as("n2"),
      max(col("nn")).as("n"),
      sum(d38(col("c1")) * d38(col("r2")) * d38(col("r2"))).as("sr4"),
      sum(d38(col("c1")) * (d38((col("nn") + 1) * 2) - d38(col("r2"))) *
        (d38((col("nn") + 1) * 2) - d38(col("r2")))).as("sc4"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nD = col("n").cast("double")
    val den = sqrt(n1 * n2 * (nD + 1) * (nD * 2 + 1) * (nD * 8 + 11) / 5)
    // 4·S_R = sr4 → 6·S_R = sr4·1.5
    val u = (col("sr4").cast("double") * 1.5 - n1 * (nD + 1) * (nD * 2 + 1)) / den
    val v = (col("sc4").cast("double") * 1.5 - n1 * (nD + 1) * (nD * 2 + 1)) / den
    val rho = (nD * nD - 4) * 2 / ((nD * 2 + 1) * (nD * 8 + 11)) - 1
    val cStat = (u * u + v * v - u * v * rho * 2) / ((lit(1.0) - rho * rho) * 2)
    agg.select(col("n1"), col("n2"),
      round(when(col("n1") >= 1 && col("n2") >= 1, u), 4).as("u"),
      round(when(col("n1") >= 1 && col("n2") >= 1, v), 4).as("v"),
      round(when(col("n1") >= 1 && col("n2") >= 1 && rho * rho < 1.0, cStat),
        4).as("c_stat"))
  }
}
