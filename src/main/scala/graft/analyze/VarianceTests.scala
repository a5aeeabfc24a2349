package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-group mean/spread comparisons — one-way ANOVA (does ANY class mean
  * differ?) and the Brown-Forsythe/Levene robust spread test (do the
  * VARIANCES differ — the assumption check ANOVA itself leans on). The
  * k-arm generalization of the two-arm Welch/Cohen family in
  * [[Experiment]]: a source/segment-level readout over event or fact
  * streams ("does quality differ by source" is an ANOVA question).
  *
  * Determinism contract: values quantize to exact 2-dp longs (the
  * per-class Σ² term must survive a long at corpus row counts); per-class
  * counts and Σx, Σx² are exact DECIMAL sums, so SSB/SSW come from the
  * moment identities over exact integers with doubles entering only in
  * the final F/η² expressions — identical on any engine at any
  * partitioning. The Brown-Forsythe centering uses the LOWER MEDIAN
  * (element ⌈n/2⌉ of the sorted class — an ACTUAL data value, the
  * [[RobustStats]] portability contract; interpolated medians differ in
  * the last float ulp across engines).
  *
  * Scale shape: ANOVA is ONE class-keyed map-side-combined aggregate
  * (class-bounded output) + a 1-row rollup. Brown-Forsythe adds the
  * per-class median — a class-keyed sort window (WindowExec spills; no
  * per-class array) — then the same two aggregates over |x − med|.
  */
object VarianceTests {

  private def d19(c: Column): Column = c.cast("decimal(19,0)")
  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** One-way ANOVA over `classCol`: one row
    * `(k, n, f_stat, eta_sq)` — F = (SSB/(k−1))/(SSW/(N−k)),
    * η² = SSB/SST. NULL F when degenerate (k < 2, N ≤ k, or zero
    * within-variance). */
  def anovaF(df: DataFrame, classCol: Column, valueCol: Column): DataFrame =
    anovaOf(df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("vq")))

  /** Brown-Forsythe (median-centered Levene): ANOVA's F applied to the
    * absolute deviations from each class's lower median. Same output
    * shape `(k, n, f_stat, eta_sq)` — here F is the spread-difference
    * statistic W. */
  def leveneBF(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    // widen the narrow scan on the value key: the |x − med| + DECIMAL
    // moment fold otherwise runs on the scan's 2-3 row-group partitions
    // behind the broadcast median join (2.9 s → 2.0 s at sf0.1); the
    // class key would be useless here (k ~ 3 partitions)
    val q = graft.operators.Spread.widen(
      df.select(classCol.as("cls"),
        round(valueCol * lit(100)).cast("long").as("xq")),
      col("xq"))
    val w = Window.partitionBy(col("cls")).orderBy(col("xq"))
    // lower median = the ⌈n/2⌉-th sorted value: an actual 2-dp long
    val med = q
      .withColumn("rn", row_number().over(w))
      .withColumn("nc", count(lit(1)).over(Window.partitionBy(col("cls"))))
      .filter(col("rn") === floor((col("nc") + 1) / 2)) // integer (n+1) div 2: Spark `/` is double division
      .select(col("cls"), col("xq").as("medq"))
    anovaOf(q.join(med, "cls")
      .select(col("cls"), abs(col("xq") - col("medq")).as("vq")))
  }

  /** Welch's heteroscedastic one-way ANOVA (Welch 1951): the k-group
    * mean comparison that does NOT assume equal variances — the k-arm
    * generalization of the Welch t in [[Experiment]], and the test to
    * reach for when [[leveneBF]]/[[bartlett]] reject. Per-class weights
    * w_j = n_j/s²_j; F* = Σw_j(m_j−m̄_w)²/(k−1) over the Welch
    * correction term, with Satterthwaite df₂ = (k²−1)/(3Λ).
    *
    * Same determinism/scale contract as [[anovaF]]: one class-keyed
    * exact-moment aggregate (2-dp longs, DECIMAL sums), doubles only in
    * the k-bounded final fold. Classes with n_j < 2 or zero variance
    * are excluded (their w_j is undefined); output
    * `(k, n, f_stat, df1, df2)` with f_stat/df2 at 6/4 dp, NULL when fewer
    * than 2 usable classes remain. */
  def welchAnova(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("vq"))
    val per = q.groupBy(col("cls"))
      .agg(count(lit(1)).as("nc"),
        sum(d19(col("vq"))).as("sc"),
        sum(d19(col("vq")) * d19(col("vq"))).as("qc"))
      // per-class doubles off exact ints — identical on every engine —
      // then PINNED to longs so the cross-class double sums are
      // order-free (the anovaOf `b` discipline): w at 12 dp, w·m at 6 dp
      .select(col("nc"),
        (col("sc").cast("double") / col("nc")).as("m"),
        ((col("qc").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") /
            col("nc")) / (col("nc") - 1)).as("v"))
      .filter(col("nc") >= 2 && col("v") > 0)
      .select(col("nc"), col("m"),
        round((col("nc") / col("v")) * lit(1e12)).cast("long").as("w12"))
    // two k-bounded folds: totals first (W, weighted grand mean), then
    // the Welch numerator / Λ against them — a broadcast of 1 row
    val tot = per.agg(count(lit(1)).as("k"), sum(col("nc")).as("n"),
      sum(col("w12")).as("sw12"),
      sum(round((col("w12") / lit(1e12)) * col("m") * lit(1e6))
        .cast("long")).as("swm6"))
    per.crossJoin(broadcast(tot))
      .groupBy(col("k"), col("n"), col("sw12"), col("swm6"))
      .agg(
        // per-class terms off pinned w and the pinned-sum-derived m̄_w,
        // themselves pinned (9 / 15 dp) before the exact sum
        sum(round({
          val w = col("w12") / lit(1e12)
          val mw = (col("swm6") / lit(1e6)) / (col("sw12") / lit(1e12))
          w * (col("m") - mw) * (col("m") - mw) * lit(1e9)
        }).cast("long")).as("num9"),
        sum(round({
          val frac = col("w12").cast("double") / col("sw12")
          (lit(1.0) - frac) * (lit(1.0) - frac) / (col("nc") - 1) * lit(1e15)
        }).cast("long")).as("lam15"))
      .select(col("k"), col("n"),
        round(when(col("k") >= 2, {
          val lam = (col("lam15") / lit(1e15)) /
            ((col("k") * col("k") - 1).cast("double"))
          ((col("num9") / lit(1e9)) / (col("k") - 1)) /
            (lit(1.0) + lit(2.0) * (col("k") - 2) * lam)
        }), 6).as("f_stat"),
        (col("k") - 1).cast("long").as("df1"),
        round(when(col("k") >= 2 && col("lam15") > 0,
          ((col("k") * col("k") - 1).cast("double")) * lit(1e15) /
            (lit(3.0) * col("lam15"))), 4).as("df2"))
  }

  /** Bartlett's test of equal variances (Bartlett 1937): the
    * likelihood-ratio sibling of [[leveneBF]] — more powerful under
    * normality, famously fragile off it (which is WHY both live here).
    * T = [(N−k)·ln S²_p − Σ(n_j−1)·ln s²_j] / C with the standard
    * small-sample correction C; T ~ χ²(k−1).
    *
    * One exact-moment class aggregate; ln enters only the k-bounded
    * fold (per-class s²_j are doubles derived from exact DECIMAL
    * moments, so both engines take ln of bit-identical inputs).
    * Classes with n_j < 2 or zero variance are excluded. Output one row
    * `(k, n, bartlett_t, df)`, T at 6 dp, NULL when k < 2. */
  def bartlett(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("vq"))
    val per = q.groupBy(col("cls"))
      .agg(count(lit(1)).as("nc"),
        sum(d19(col("vq"))).as("sc"),
        sum(d19(col("vq")) * d19(col("vq"))).as("qc"))
      .select(col("nc"),
        ((col("qc").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") /
            col("nc")) / (col("nc") - 1)).as("v"))
      .filter(col("nc") >= 2 && col("v") > 0)
    // per-class term pins keep the cross-class double sums order-free —
    // the anovaOf discipline; factors sized to survive corpus-scale
    // counts in the long (unit pin for the Σ(n−1)s² term, which carries
    // n·s² magnitudes, like anovaOf's b; 1e6 for the ln sums)
    per.agg(count(lit(1)).as("k"), sum(col("nc")).as("n"),
        sum(round((col("nc") - 1).cast("double") * col("v"))
          .cast("long")).as("ssw0"),
        sum(round((col("nc") - 1).cast("double") * log(col("v")) * lit(1e6))
          .cast("long")).as("slnv6"),
        sum(round(lit(1e15) / (col("nc") - 1)).cast("long")).as("sinv15"))
      .select(col("k"), col("n"),
        round(when(col("k") >= 2 && col("n") > col("k"), {
          val nmk = (col("n") - col("k")).cast("double")
          val sp2 = col("ssw0").cast("double") / nmk
          val t0 = nmk * log(sp2) - col("slnv6") / lit(1e6)
          val c = lit(1.0) + (col("sinv15") / lit(1e15) - lit(1.0) / nmk) /
            (lit(3.0) * (col("k") - 1))
          t0 / c
        }), 6).as("bartlett_t"),
        (col("k") - 1).cast("long").as("df"))
  }

  /** Fligner-Killeen test of equal variances (Fligner & Killeen 1976,
    * Conover-Johnson-Johnson form): the RANK-based member of the spread
    * triad — [[leveneBF]] (robust moments) / [[bartlett]] (normal LR) /
    * this (normal scores of ranked |x − med_j|, the most outlier-proof).
    * Scores a_i = Φ⁻¹(1/2 + r_i/(2(N+1))) over pooled average ranks of
    * the absolute deviations from each class's lower median;
    * X² = Σ_j n_j(Ā_j − ā)² / V² ~ χ²(k−1) with V² the sample variance
    * of all scores.
    *
    * Determinism: ranks come from the distinct-deviation fold (doubled
    * average ranks, exact longs — the [[RankStats.kruskalWallis]]
    * machinery); each distinct deviation's score runs through the shared
    * [[graft.functions.Probit]] on exact-integer-derived doubles and is
    * pinned to a 9-dp long, so every cross-row sum is exact DECIMAL.
    * Scale shape: per-class median sort window (spills, no arrays) + one
    * deviation-keyed fold; rank window and score math run on the
    * distinct-deviation frame (value-range-bounded, like all house rank
    * tests). Output one row `(k, n, fk_stat, df)`, 4 dp. */
  def flignerKilleen(df: DataFrame, classCol: Column,
                     valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("xq"))
    val w = Window.partitionBy(col("cls")).orderBy(col("xq"))
    val med = q
      .withColumn("rn", row_number().over(w))
      .withColumn("nc", count(lit(1)).over(Window.partitionBy(col("cls"))))
      .filter(col("rn") === floor((col("nc") + 1) / 2))
      .select(col("cls"), col("xq").as("medq"))
    val dev = q.join(med, "cls")
      .select(col("cls"), abs(col("xq") - col("medq")).as("dv"))
    val cells = dev.groupBy(col("dv"), col("cls")).agg(count(lit(1)).as("cnt"))
    val byV = cells.groupBy(col("dv")).agg(sum(col("cnt")).as("ct"))
    val tot = byV.agg(sum(col("ct")).as("nn"))
    val wc = Window.orderBy(col("dv")).rowsBetween(Long.MinValue, -1)
    // doubled average rank r2 = 2r; score argument 1/2 + r/(2(N+1))
    // = 1/2 + r2/(4(N+1)) is strictly in (1/2, 1) — probit's domain
    val scored = byV
      .withColumn("r2",
        lit(2) * coalesce(sum(col("ct")).over(wc), lit(0L)) + col("ct") + 1)
      .crossJoin(broadcast(tot))
      .select(col("dv"), col("ct"),
        round(graft.functions.Probit.probit(
          lit(0.5) + col("r2").cast("double") /
            (lit(4.0) * (col("nn") + 1))) * lit(1e9))
          .cast("long").as("a9"))
    val glob = scored.agg(sum(col("ct")).as("n"),
      sum(d19(col("ct")) * d19(col("a9"))).as("s9"),
      sum(d38(col("ct")) * d38(col("a9")) * d38(col("a9"))).as("q18"))
    val perCls = cells.join(scored.select(col("dv"), col("a9")), "dv")
      .groupBy(col("cls"))
      .agg(sum(col("cnt")).as("nj"),
        sum(d19(col("cnt")) * d19(col("a9"))).as("sj9"))
    perCls.crossJoin(broadcast(glob))
      // per-class n_j(Ā_j − ā)² in a9² units, scaled down 1e12 and
      // pinned so the k-class sum is order-free and fits a long
      .groupBy(col("n"), col("s9"), col("q18"))
      .agg(count(lit(1)).as("k"),
        sum(round({
          val mj = col("sj9").cast("double") / col("nj")
          val ab = col("s9").cast("double") / col("n")
          col("nj") * (mj - ab) * (mj - ab) / lit(1e12)
        }).cast("long")).as("num6"))
      .select(col("k"), col("n"),
        round(when(col("k") >= 2 && col("n") > 1, {
          val vsq = (col("q18").cast("double") -
            col("s9").cast("double") * col("s9").cast("double") /
              col("n")) / (col("n") - 1)
          when(vsq > 0, col("num6").cast("double") * lit(1e12) / vsq)
        }), 4).as("fk_stat"),
        (col("k") - 1).cast("long").as("df"))
  }

  /** Shared core over a pre-quantized `(cls, vq: long)` frame. */
  private def anovaOf(q: DataFrame): DataFrame = {
    val per = q.groupBy(col("cls"))
      .agg(count(lit(1)).as("nc"),
        sum(d19(col("vq"))).as("sc"),
        sum(d19(col("vq")) * d19(col("vq"))).as("qc"))
    per.agg(
        count(lit(1)).as("k"),
        sum(col("nc")).as("n"),
        sum(d38(col("sc"))).as("s"),
        sum(col("qc")).as("q"),
        // Σ s_c²/n_c carries the only non-integer per-class term; one
        // pinned double per class, rounded to the unit of the already
        // (2-dp)²-scaled integer space (a finer 1e6 factor overflowed
        // the long at corpus magnitudes), exactly summed
        sum(round(col("sc").cast("double") * col("sc").cast("double") /
          col("nc")).cast("long")).as("b"))
      .select(col("k"), col("n"), round({
          val n = col("n").cast("double"); val k = col("k").cast("double")
          // SSB >= 0 by identity; the unit-rounding of b can push an
          // exactly-zero SSB a hair negative — clamp (mirrored in SQL)
          val ssb = greatest(col("b").cast("double") -
            col("s").cast("double") * col("s").cast("double") / n, lit(0.0))
          val ssw = col("q").cast("double") - col("b").cast("double")
          when(col("k") >= 2 && col("n") > col("k") && ssw > 0,
            (ssb / (k - 1)) / (ssw / (n - k)))
        }, 6).as("f_stat"),
        round({
          val n = col("n").cast("double")
          val ssb = greatest(col("b").cast("double") -
            col("s").cast("double") * col("s").cast("double") / n, lit(0.0))
          val sst = col("q").cast("double") -
            col("s").cast("double") * col("s").cast("double") / n
          when(sst > 0, ssb / sst)
        }, 6).as("eta_sq"))
  }

  /** Alexander-Govern k-group mean test (Alexander & Govern 1994): the
    * normal-scores alternative to [[welchAnova]] for unequal variances —
    * each class's `t_k = (m_k − x̄₊)/se_k` (x̄₊ the inverse-se²-weighted
    * grand mean) is normalized by Hill's (1970) transformation
    * `z = c + (c³+3c)/b − (4c⁷+33c⁵+240c³+855c)/(10b²+8bc⁴+1000b)` with
    * `ν = n_k−1, a = ν−½, b = 48a², c = sign(t)·√(a·ln(1+t²/ν))`, and
    * `A = Σz² ~ χ²(k−1)`. Output one row `(k, df, a_stat)`.
    *
    * Determinism discipline = [[welchAnova]]'s: exact DECIMAL class
    * moments → per-class doubles (bit-identical on both engines) →
    * weights pinned to 12-dp longs so the cross-class folds are
    * order-free → per-class z² pinned to 9-dp longs before the exact
    * final sum. Classes with n < 2 or zero variance are excluded. */
  def alexanderGovern(df: DataFrame, classCol: Column,
                      valueCol: Column): DataFrame = {
    // 2-dp quanta (the welchAnova choice): the w = 1/se² weights live at
    // ~1e-3 in these units, so the 12-dp pin keeps ~10 significant
    // digits — 1e-6 quanta would crush them to two
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("vq"))
    val per = q.groupBy(col("cls"))
      .agg(count(lit(1)).as("nc"),
        sum(d19(col("vq"))).as("sc"),
        sum(d19(col("vq")) * d19(col("vq"))).as("qc"))
      .select(col("nc"),
        (col("sc").cast("double") / col("nc")).as("m"),
        ((col("qc").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") /
            col("nc")) / (col("nc") - 1)).as("v"))
      .filter(col("nc") >= 2 && col("v") > 0)
      // se² = v/n; weight w = 1/se² pinned at 12 dp (quanta² units)
      .select(col("nc"), col("m"), (col("v") / col("nc")).as("se2"))
      .withColumn("w12", round((lit(1.0) / col("se2")) * lit(1e12)).cast("long"))
    val tot = per.agg(count(lit(1)).as("k"), sum(col("w12")).as("sw12"),
      sum(round((col("w12") / lit(1e12)) * col("m") * lit(1e6))
        .cast("long")).as("swm6"))
    per.crossJoin(broadcast(tot))
      .groupBy(col("k"))
      .agg(sum(round({
        val mw = (col("swm6") / lit(1e6)) / (col("sw12") / lit(1e12))
        val t = (col("m") - mw) / sqrt(col("se2"))
        val nu = (col("nc") - 1).cast("double")
        val a = nu - 0.5
        val b = a * a * 48
        val c = signum(t) * sqrt(a * log(lit(1.0) + t * t / nu))
        val z = c + (c * c * c + c * 3) / b -
          (c * c * c * c * c * c * c * 4 + c * c * c * c * c * 33 +
            c * c * c * 240 + c * 855) /
          (b * b * 10 + b * (c * c * c * c) * 8 + b * 1000)
        val z9 = round(z * lit(1e9)) / lit(1e9)
        round(z9 * z9 * lit(1e9))
      }).cast("long")).as("asum9"))
      .select(col("k"), (col("k") - 1).cast("long").as("df"),
        round(when(col("k") >= 2, col("asum9").cast("double") / 1e9), 6)
          .as("a_stat"))
  }

  /** Kruskal-Wallis rank test (1952) — the NONPARAMETRIC k-group
    * location comparison beside [[anovaF]] (means) and [[leveneBF]]
    * (spreads): `H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1)` over rank sums,
    * divided by the tie correction `C = 1 − Σ(t³−t)/(N³−N)`. One row
    * `(k, n, h_stat, h_tied, df)` — h at 6 dp, NULL when degenerate
    * (k < 2 or every value tied).
    *
    * Exactness: doubled average ranks (`2r = 2·c_lt + c_eq + 1`) come
    * off the DISTINCT-VALUE fold (value-bounded, one ordered prefix
    * window), so per-group rank sums are exact DECIMALs and doubles
    * enter only in the closing H/C expressions. Scale: one group×value
    * aggregate (map-side combined), one value-bounded window, one
    * class-bounded rollup — the corpus never sorts globally. */
  def kruskalWallis(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(100)).cast("long").as("vq"))
    val gv = q.groupBy(col("cls"), col("vq")).agg(count(lit(1)).as("c"))
    val byV = gv.groupBy(col("vq")).agg(sum(col("c")).as("ceq"))
    val wv = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, -1)
    // doubled average rank per distinct value
    val r2 = byV
      .withColumn("clt", coalesce(sum(col("ceq")).over(wv), lit(0L)))
      .select(col("vq"), (lit(2) * col("clt") + col("ceq") + 1).as("r2"),
        col("ceq"))
    val perG = gv.join(r2.select(col("vq"), col("r2")), "vq")
      .groupBy(col("cls"))
      .agg(sum(col("c")).as("nj"),
        sum(d38(col("c")) * d38(col("r2"))).as("sr2"))
    val ties = r2.agg(
      sum((d38(col("ceq")) * d38(col("ceq"))).cast("decimal(38,0)") *
        d38(col("ceq")) - d38(col("ceq"))).as("tsum"))
    perG.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
        // Σ R_j²/n_j with R_j = sr2/2: pinned per class at 6 dp so the
        // cross-class double sum is order-free
        sum(round(col("sr2").cast("double") * col("sr2").cast("double") /
          4.0 / col("nj") * lit(1e6)).cast("decimal(38,0)")).as("rr6"))
      .crossJoin(broadcast(ties))
      .select({
        val n = col("n").cast("double")
        val h = lit(12.0) / (n * (n + 1)) *
          (col("rr6").cast("double") / 1e6) - lit(3.0) * (n + 1)
        val c = lit(1.0) - col("tsum").cast("double") / (n * n * n - n)
        Seq(col("k"), col("n"),
          round(when(col("k") >= 2 && col("n") > 1, h), 6).as("h_stat"),
          round(when(col("k") >= 2 && col("n") > 1 && c > 0, h / c), 6)
            .as("h_tied"),
          (col("k") - 1).cast("long").as("df"))
      }: _*)
  }
}
