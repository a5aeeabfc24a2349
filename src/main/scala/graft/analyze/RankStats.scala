package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based nonparametric statistics — Mann-Whitney/Wilcoxon rank-sum
  * and Spearman rank correlation — completing the distribution-free test
  * family (chi-square q201, KS q212, log-rank q208): no normality
  * assumption, outlier-proof by construction.
  *
  * The shared engine trick: average ranks with ties are computed on the
  * DISTINCT-VALUE frame (per value: doubled average rank
  * `r₂ = 2·cum_before + cnt + 1` — an INTEGER), never by ranking raw
  * rows — so the rank windows run over |distinct values| rows and every
  * rank quantity stays exact. Formulas (tie-corrected variance, the
  * Pearson-on-ranks closed form) run in double over exact integer sums.
  */
object RankStats {

  /** Doubled-average-rank frame for one column: `(v, cnt, r2)`. */
  private def rank2(df: DataFrame, vCol: String): DataFrame = {
    val byV = df.groupBy(col(vCol).as("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    byV.withColumn("r2",
      lit(2) * coalesce(sum(col("cnt")).over(w), lit(0L)) + col("cnt") + 1)
  }

  /** Mann-Whitney U between `sampleFilter` rows (sample 1) and the rest:
    * `(n1, n2, u1, z)` — U from exact doubled rank sums, z from the
    * tie-corrected variance (no continuity correction, documented). */
  def mannWhitney(df: DataFrame, valueCol: String,
                  sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val ranked = byV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
    val agg = ranked.agg(
      sum(col("c1")).as("n1"),
      (sum(col("ct")) - sum(col("c1"))).as("n2"),
      sum(col("c1").cast("decimal(19,0)") * col("r2").cast("decimal(19,0)"))
        .as("r1x2"),
      // tie term Σ(t³ − t) over tied groups, exact decimal
      sum(col("ct").cast("decimal(19,0)") * col("ct").cast("decimal(19,0)") *
        col("ct").cast("decimal(19,0)") -
        col("ct").cast("decimal(19,0)")).as("tie3"))
    agg.select({
      val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
      val n = n1 + n2
      // U₁ = R₁ − n1(n1+1)/2, with R₁ = r1x2/2 exact halves
      val u1 = col("r1x2").cast("double") / 2.0 - n1 * (n1 + 1) / 2.0
      val v = n1 * n2 / 12.0 *
        ((n + 1) - col("tie3").cast("double") / (n * (n - 1)))
      Seq(col("n1"), col("n2"),
        round(u1, 1).as("u1"),
        round(when(v > 0, (u1 - n1 * n2 / 2.0) / sqrt(v)), 4).as("z"))
    }: _*)
  }

  /** Spearman rank correlation between two numeric columns: Pearson on
    * exact doubled average ranks, 6 dp. */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(
      round(xCol * lit(1000000)).cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rx = rank2(base, "x").select(col("v").as("x"), col("r2").as("rx"))
    val ry = rank2(base, "y").select(col("v").as("y"), col("r2").as("ry"))
    val joined = base.join(rx, "x").join(ry, "y")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val out = joined.agg(
        count(lit(1)).as("n"),
        sum(d19(col("rx"))).as("sa"), sum(d19(col("ry"))).as("sb"),
        sum(d19(col("rx")) * d19(col("rx"))).as("saa"),
        sum(d19(col("ry")) * d19(col("ry"))).as("sbb"),
        sum(d19(col("rx")) * d19(col("ry"))).as("sab"))
      .select(col("n"), round({
        val n = col("n").cast("double")
        val cov = n * col("sab").cast("double") -
          col("sa").cast("double") * col("sb").cast("double")
        val va = n * col("saa").cast("double") -
          col("sa").cast("double") * col("sa").cast("double")
        val vb = n * col("sbb").cast("double") -
          col("sb").cast("double") * col("sb").cast("double")
        when(va > 0 && vb > 0, cov / sqrt(va * vb))
      }, 6).as("spearman_rho"))
    out
  }

  /** Kendall tau-b per group between a time axis and a daily metric —
    * the pair-counting cousin of [[spearman]] (and the correlation the
    * Mann-Kendall S of [[Trend.theilSenMannKendall]] normalizes into):
    * `τ_b = (C − D) / √((n₀ − n_x)(n₀ − n_y))` with `n₀ = n(n−1)/2`
    * and the tie corrections `n_x/n_y = Σ t(t−1)/2`.
    *
    * Exactness: the corpus folds ONCE to the per-(group, day) exact
    * 6-dp-long totals frame; concordant/discordant/tie counts are
    * integer aggregates over the day-pair self-join — the SAME
    * T²-per-group bound as Theil-Sen's pairwise slopes (T = days in
    * range, a constant of the study window, NOT of corpus size); τ_b is
    * one double expression at the end. Output per group:
    * `(group, n_days, concordant, discordant, tau_b)`. */
  def kendallTau(df: DataFrame, groupCol: String, tsCol: String,
                 valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("vq"))
    val a = daily.select(col("g"), col("day").as("d1"), col("vq").as("v1"))
    val b = daily.select(col("g"), col("day").as("d2"), col("vq").as("v2"))
    val pairs = a.join(b, Seq("g")).filter(col("d1") < col("d2"))
    val agg = pairs.groupBy(col("g"))
      .agg(
        sum(when(col("v2") > col("v1"), 1L).otherwise(0L)).as("c"),
        sum(when(col("v2") < col("v1"), 1L).otherwise(0L)).as("d"),
        // x (the day) is distinct by construction → n_x = 0; y ties
        // counted directly on the pair frame: a tied pair is one tie pair
        sum(when(col("v2") === col("v1"), 1L).otherwise(0L)).as("ty"),
        count(lit(1)).as("n0"))
    val nDays = daily.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
    agg.join(nDays, "g")
      .select(col("g").as(groupCol), col("n_days"),
        col("c").as("concordant"), col("d").as("discordant"),
        round({
          val n0 = col("n0").cast("double")
          val denom = sqrt(n0 * (n0 - col("ty").cast("double")))
          when(denom > 0,
            (col("c") - col("d")).cast("double") / denom)
        }, 6).as("tau_b"))
      .orderBy(col(groupCol))
  }

  /** Kruskal-Wallis H across the classes of `classCol` — the k-sample
    * extension of [[mannWhitney]] (and the rank-based sibling of
    * [[VarianceTests.anovaF]]): does ANY class's value distribution sit
    * higher or lower than the others, with no normality assumption.
    *
    * Engine: the shared distinct-value doubled-rank trick — per (value,
    * class) cell counts join the |distinct values|-row rank frame, so the
    * per-class doubled rank sums `S_i = Σ cnt·r₂` are EXACT integers and
    * no row-level rank window ever runs (the corpus pays one hash
    * aggregate; every window is distinct-value-bounded). The per-class
    * term `S_i²/n_i` is pinned once to an integer (`round` of one double
    * expression over exact inputs — deterministic IEEE ops), so the
    * class sum is order-invariant; H and the tie-corrected H/C are one
    * double expression at the end. One row:
    * `(k, n, h, h_adj)` at 4 dp. */
  /** Dunn's post-hoc test — WHICH class pairs differ once
    * [[kruskalWallis]] says "some pair does": for every unordered class
    * pair the mean-rank gap standardized by the tie-corrected rank
    * variance, `z = (R̄_i − R̄_j) / √(σ²·(1/n_i + 1/n_j))` with
    * `σ² = N(N+1)/12 − Σ(t³−t)/(12(N−1))` (Dunn 1964).
    *
    * Engine: the SAME distinct-value doubled-rank frame as
    * [[kruskalWallis]] — per-class doubled rank sums are exact integers;
    * mean ranks and z are one double expression over them. The pair
    * frame is the k-class aggregate crossed with itself (k² rows, k =
    * #classes — bounded), never the corpus. Output per pair (g1 < g2):
    * `(g1, g2, n1, n2, mean_rank_1, mean_rank_2, z)` at 4 dp. */
  def dunn(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("g"),
      round(valueCol * lit(1000000)).cast("long").as("v"))
    val cells = q.groupBy(col("v"), col("g")).agg(count(lit(1)).as("cnt"))
    val byV = cells.groupBy(col("v")).agg(sum(col("cnt")).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val ranked = byV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
    def d19(c: Column) = c.cast("decimal(19,0)")
    val cls = cells.join(ranked.select(col("v"), col("r2")), "v")
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("n_i"),
        sum(d19(col("cnt")) * d19(col("r2"))).as("s2"))
    val tot = ranked.agg(sum(col("ct")).as("n"),
      sum(d19(col("ct")) * d19(col("ct")) * d19(col("ct")) - d19(col("ct")))
        .as("tie3"))
    val a = cls.select(col("g").as("g1"), col("n_i").as("n1"),
      col("s2").as("s21"))
    val b = cls.select(col("g").as("g2"), col("n_i").as("n2"),
      col("s2").as("s22"))
    a.crossJoin(b).filter(col("g1") < col("g2"))
      .crossJoin(broadcast(tot))
      .select(Seq(col("g1"), col("g2"), col("n1"), col("n2")) ++ {
        val mr1 = col("s21").cast("double") / (lit(2.0) * col("n1"))
        val mr2 = col("s22").cast("double") / (lit(2.0) * col("n2"))
        val n = col("n").cast("double")
        val sig2 = n * (n + 1) / 12.0 -
          col("tie3").cast("double") / (lit(12.0) * (n - 1))
        val se = sqrt(sig2 * (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
        Seq(round(mr1, 4).as("mean_rank_1"), round(mr2, 4).as("mean_rank_2"),
          round(when(se > 0, (mr1 - mr2) / se), 4).as("z"))
      }: _*)
      .orderBy(col("g1"), col("g2"))
  }

  /** Jonckheere-Terpstra test for an ORDERED alternative across k
    * groups (ordered by the group key's natural sort): are values
    * trending up as the group ordinal rises — strictly sharper than
    * [[kruskalWallis]] when the alternative is monotone (Jonckheere
    * 1954; the group-ordinal cousin of [[Trend]]'s Mann-Kendall).
    * `JT = Σ_{i<j} U_ij`; expectation `(N² − Σn_i²)/4`; variance with
    * the full Hollander-Wolfe tie correction (three terms over value-tie
    * and group-size tallies — every tally an exact integer).
    *
    * Engine: a (distinct values × k groups) grid — per-group cumulative
    * counts below each value (window per group over the value frame),
    * then a prefix over GROUP ORDER within each value row gives
    * `Σ_{i<j}` in one pass; `JT₂ = Σ cnt_j·(2·below_{<j} + ties_{<j})`
    * is an exact integer. All windows are distinct-value-bounded
    * (documented: never corpus-row-scaled). One row:
    * `(k, n, jt, e_jt, z)` — jt/e_jt at 1 dp (exact halves), z at 4. */
  def jonckheere(df: DataFrame, groupCol: Column,
                 valueCol: Column): DataFrame = {
    val q = df.select(groupCol.cast("string").as("g"),
      round(valueCol * lit(1000000)).cast("long").as("v"))
    val cells = q.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val byV = cells.groupBy(col("v")).agg(sum(col("cnt")).as("ct"))
    val groups = cells.select(col("g")).distinct()
    val grid = byV.select(col("v")).crossJoin(broadcast(groups))
      .join(cells, Seq("g", "v"), "left")
      .na.fill(0L, Seq("cnt"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, -1)
    val wv = Window.partitionBy(col("v")).orderBy(col("g"))
      .rowsBetween(Long.MinValue, -1)
    def d19(c: Column) = c.cast("decimal(19,0)")
    val pre = grid
      .withColumn("below", coalesce(sum(col("cnt")).over(wg), lit(0L)))
      .withColumn("lsum", coalesce(sum(col("below")).over(wv), lit(0L)))
      .withColumn("tsum", coalesce(sum(col("cnt")).over(wv), lit(0L)))
    val jt = pre.agg(sum(d19(col("cnt")) *
      (lit(2) * d19(col("lsum")) + d19(col("tsum")))).as("jt2"))
    // group-size tallies u· and value-tie tallies t· — all exact
    val ns = cells.groupBy(col("g")).agg(sum(col("cnt")).as("n_i"))
    def tall(c: Column) = Seq(
      sum(d19(c)).as("s1"), sum(d19(c) * d19(c)).as("s2"),
      sum(d19(c) * (d19(c) - 1) * (lit(2) * d19(c) + 5)).as("t25"),
      sum(d19(c) * (d19(c) - 1) * (d19(c) - 2)).as("t3"),
      sum(d19(c) * (d19(c) - 1)).as("t2"))
    val gt = ns.agg(count(lit(1)).as("k"), tall(col("n_i")): _*)
    val vt = byV.agg(tall(col("ct")).head, tall(col("ct")).tail: _*)
      .select(col("s1").as("vs1"), col("s2").as("vs2"),
        col("t25").as("vt25"), col("t3").as("vt3"), col("t2").as("vt2"))
    jt.crossJoin(broadcast(gt)).crossJoin(broadcast(vt))
      .select(Seq(col("k"), col("s1").cast("long").as("n")) ++ {
        val n = col("s1").cast("double")
        val e2 = (col("s1").cast("decimal(38,0)") * col("s1").cast("decimal(38,0)")
          - col("s2")).cast("double") / 2.0
        val v1 = (n * (n - 1) * (n * 2 + 5) - col("vt25").cast("double") -
          col("t25").cast("double")) / 72.0
        val v2 = col("vt3").cast("double") * col("t3").cast("double") /
          (lit(36.0) * n * (n - 1) * (n - 2))
        val v3 = col("vt2").cast("double") * col("t2").cast("double") /
          (lit(8.0) * n * (n - 1))
        val vr = v1 + v2 + v3
        Seq(round(col("jt2").cast("double") / 2.0, 1).as("jt"),
          round(e2 / 2.0, 1).as("e_jt"),
          round(when(vr > 0,
            (col("jt2").cast("double") - e2) / (lit(2.0) * sqrt(vr))),
            4).as("z"))
      }: _*)
  }

  def kruskalWallis(df: DataFrame, classCol: Column,
                    valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("g"),
      round(valueCol * lit(1000000)).cast("long").as("v"))
    val cells = q.groupBy(col("v"), col("g")).agg(count(lit(1)).as("cnt"))
    val byV = cells.groupBy(col("v")).agg(sum(col("cnt")).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val ranked = byV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
    def d19(c: Column) = c.cast("decimal(19,0)")
    val cls = cells.join(ranked.select(col("v"), col("r2")), "v")
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("n_i"),
        sum(d19(col("cnt")) * d19(col("r2"))).as("s2"))
      // pin S_i²/(4·n_i) to an integer ONCE (exact-int inputs → one
      // deterministic double expression) so the cross-class sum below is
      // an exact long sum, independent of class iteration order
      .select(col("n_i"),
        round(col("s2").cast("double") * col("s2").cast("double") /
          (lit(4.0) * col("n_i").cast("double"))).cast("decimal(28,0)").as("u"))
    val tie = ranked.agg(
      sum(d19(col("ct")) * d19(col("ct")) * d19(col("ct")) - d19(col("ct")))
        .as("tie3"))
    cls.agg(count(lit(1)).as("k"), sum(col("n_i")).as("n"),
        sum(col("u")).as("su"))
      .crossJoin(broadcast(tie))
      .select(Seq(col("k"), col("n")) ++ {
        val n = col("n").cast("double")
        val h = lit(12.0) / (n * (n + 1)) * col("su").cast("double") -
          lit(3.0) * (n + 1)
        val c = lit(1.0) - col("tie3").cast("double") / (n * n * n - n)
        Seq(round(h, 4).as("h"),
          round(when(c > 0, h / c), 4).as("h_adj"))
      }: _*)
  }

  /** Friedman test over a (block × treatment) metric grid — the
    * repeated-measures cousin of [[kruskalWallis]]: blocks (days) remove
    * the shared day-level shift, treatments (categories) are ranked
    * WITHIN each block, so "is any treatment consistently higher" is
    * answered free of day effects. The metric is the exact per-(block,
    * treatment) row count; absent cells enter as genuine zero counts via
    * the (bounded) block×treatment grid, ties get average ranks.
    *
    * Exactness: with doubled ranks every quantity is an integer —
    * numerator `Σ_j (S_j − n(k+1))²` and denominator
    * `Σ_ij r₂² − 4·n·k·(k+1)²/4` arithmetic stays in DECIMAL; the
    * tie-corrected statistic
    * `Q = (k−1)·Σ_j(S_j − n(k+1))² / (Σ_ij r₂²/... )` reduces to ONE
    * division of two exact integers (both already ×4-scaled identically,
    * so the scale cancels). One row: `(n_blocks, k, q)` at 4 dp.
    *
    * Scale shape: one corpus hash-aggregate to the cell frame; the grid,
    * rank windows (per block over k treatments) and moments are all
    * (blocks × treatments)-bounded. */
  def friedman(df: DataFrame, blockCol: Column,
               treatmentCol: Column): DataFrame = {
    val cellsRaw = df.groupBy(blockCol.as("b"), treatmentCol.as("t"))
      .agg(count(lit(1)).as("v"))
    val blocks = cellsRaw.select(col("b")).distinct()
    val treatments = cellsRaw.select(col("t")).distinct()
    val grid = blocks.crossJoin(broadcast(treatments))
    val cells = grid.join(cellsRaw, Seq("b", "t"), "left")
      .select(col("b"), col("t"), coalesce(col("v"), lit(0L)).as("v"))
    // doubled average ranks within each block over the k-bounded cells
    val byBV = cells.groupBy(col("b"), col("v")).agg(count(lit(1)).as("ct"))
    val w = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, -1)
    val ranked = byBV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
    val rcells = cells.join(ranked.select(col("b"), col("v"), col("r2")),
      Seq("b", "v"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val nk = rcells.agg(countDistinct(col("b")).as("n"),
      countDistinct(col("t")).as("k"),
      sum(d19(col("r2")) * d19(col("r2"))).as("sr2sq"))
    val sj = rcells.groupBy(col("t")).agg(sum(d19(col("r2"))).as("s2"))
    val num = sj.crossJoin(broadcast(nk.select(col("n"), col("k"))))
      .select((col("s2") - d19(col("n")) * (d19(col("k")) + 1)).as("dev"))
      .agg(sum(col("dev") * col("dev")).as("sdev"))
    num.crossJoin(broadcast(nk))
      .select(col("n").as("n_blocks"), col("k"), round({
        // Q = (k−1)·Σ(S_j − n(k+1))² / (Σ r₂² − n·k·(k+1)²): both sides
        // carry the same ×4 rank scaling, which cancels in the ratio
        val k = col("k").cast("double"); val n = col("n").cast("double")
        val den = col("sr2sq").cast("double") - n * k * (k + 1) * (k + 1)
        when(den > 0,
          (k - 1) * col("sdev").cast("double") / den)
      }, 4).as("q"))
  }

  /** Page's trend test for ORDERED alternatives across blocks — the
    * directional upgrade of [[friedman]]: where Friedman asks "does any
    * treatment differ", Page's L asks "do the treatments trend in the
    * PREDICTED order" (here the pinned lexicographic treatment order —
    * callers with a substantive ordering relabel accordingly), with far
    * more power against monotone alternatives.
    *
    * `L = Σ_j j·R_j` over within-block average ranks (same exact
    * doubled-rank grid as Friedman — absent cells are true zeros, ties
    * averaged); `z = (L − nk(k+1)²/4) / √(nk²(k+1)²(k−1)/144)`, the
    * no-tie normal approximation (documented — ties only shrink the
    * true variance). One row: `(n_blocks, k, l, z)` with L at 1 dp
    * (exact half-integers) and z at 4 dp. */
  def pageTrend(df: DataFrame, blockCol: Column,
                treatmentCol: Column): DataFrame = {
    val cellsRaw = df.groupBy(blockCol.as("b"), treatmentCol.as("t"))
      .agg(count(lit(1)).as("v"))
    val blocks = cellsRaw.select(col("b")).distinct()
    val treatments = cellsRaw.select(col("t")).distinct()
      .withColumn("j", row_number().over(Window.orderBy(col("t"))))
    val grid = blocks.crossJoin(broadcast(treatments))
    val cells = grid.join(cellsRaw, Seq("b", "t"), "left")
      .select(col("b"), col("j"), coalesce(col("v"), lit(0L)).as("v"))
    val byBV = cells.groupBy(col("b"), col("v")).agg(count(lit(1)).as("ct"))
    val w = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, -1)
    val ranked = byBV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
    val rcells = cells.join(ranked.select(col("b"), col("v"), col("r2")),
      Seq("b", "v"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    rcells.agg(
        countDistinct(col("b")).as("n"),
        countDistinct(col("j")).as("k"),
        sum(d19(col("j")) * d19(col("r2"))).as("l2"))
      .select(col("n").as("n_blocks"), col("k"),
        round(col("l2").cast("double") / 2, 1).as("l"),
        round({
          val n = col("n").cast("double"); val k = col("k").cast("double")
          val e = n * k * (k + 1) * (k + 1) / 4
          val v = n * k * k * (k + 1) * (k + 1) * (k - 1) / 144
          when(v > 0, (col("l2").cast("double") / 2 - e) / sqrt(v))
        }, 4).as("z"))
  }

  /** Goodman-Kruskal gamma + Somers' D between two DAILY metrics of the
    * same stream (default framing: does volume move with value-per-
    * event?): γ = (C−D)/(C+D) ignores ties entirely (the ordinal
    * association among the pairs that actually order), while Somers'
    * `D_yx = (C−D)/(C+D+T_y)` penalizes ties on the DEPENDENT side —
    * the asymmetric "y follows x" version. Complements [[kendallTau]]
    * (whose τ-b penalizes both tie directions symmetrically). One row:
    * `(n_days, concordant, discordant, ties_x, ties_y, gamma,
    * somers_d_yx)`.
    *
    * Exactness: both daily metrics are exact integers (count; 6-dp-long
    * value sum scaled by the count into a 9-dp mean pinned once), every
    * pair class is an exact integer count off one day×day self-join
    * (days² pairs — the corpus folds to days first), and the two
    * statistics are single divisions at the end. */
  def gammaSomers(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col(valueCol) * lit(1000000)).cast("long")).as("vq"))
      // y = per-event mean value at 9 dp — one pinned double per day
      .select(col("day"), col("x"),
        round(col("vq").cast("double") / col("x") * lit(1000)).cast("long").as("y"))
    val a = daily.select(col("day").as("d1"), col("x").as("x1"), col("y").as("y1"))
    val b = daily.select(col("day").as("d2"), col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, col("d1") < col("d2"))
    pairs.agg(
        count(lit(1)).as("n0"),
        sum(when(col("x1") =!= col("x2") && col("y1") =!= col("y2") &&
          (col("x2") > col("x1")) === (col("y2") > col("y1")), 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("x1") =!= col("x2") && col("y1") =!= col("y2") &&
          (col("x2") > col("x1")) =!= (col("y2") > col("y1")), 1L)
          .otherwise(0L)).as("d"),
        sum(when(col("x1") === col("x2"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("x1") =!= col("x2") && col("y1") === col("y2"), 1L)
          .otherwise(0L)).as("ty"))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .select(col("n_days"), col("c").as("concordant"), col("d").as("discordant"),
        col("tx").as("ties_x"), col("ty").as("ties_y"),
        round(when(col("c") + col("d") > 0,
          (col("c") - col("d")).cast("double") / (col("c") + col("d"))), 6)
          .as("gamma"),
        round(when(col("c") + col("d") + col("ty") > 0,
          (col("c") - col("d")).cast("double") /
            (col("c") + col("d") + col("ty"))), 6).as("somers_d_yx"))
  }

  /** Van der Waerden normal-scores test (1952/1953): Kruskal-Wallis with
    * the pooled average ranks pushed through Φ⁻¹(r/(N+1)) — asymptotic
    * efficiency 1 against the F-test under normality while staying fully
    * rank-based (the location counterpart of
    * [[VarianceTests.flignerKilleen]]'s spread test).
    * `X² = Σ_j n_j·Ā_j² / s²` with `s² = Σ a_i²/(N−1)` ~ χ²(k−1).
    *
    * Determinism: the distinct-value doubled-rank fold feeds the shared
    * [[graft.functions.Probit]] on exact-integer-derived doubles; scores
    * pin to 9-dp longs, every cross-row sum is exact DECIMAL, per-class
    * X² terms pin before the k-bounded fold. Output
    * `(k, n, vdw_stat, df)` at 4 dp; NULL when degenerate. */
  def vanDerWaerden(df: DataFrame, classCol: Column,
                    valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(1000000)).cast("long").as("v"))
    val cells = q.groupBy(col("v"), col("cls")).agg(count(lit(1)).as("cnt"))
    val byV = cells.groupBy(col("v")).agg(sum(col("cnt")).as("ct"))
    val tot = byV.agg(sum(col("ct")).as("nn"))
    val wc = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val scored = byV
      .withColumn("r2",
        lit(2) * coalesce(sum(col("ct")).over(wc), lit(0L)) + col("ct") + 1)
      .crossJoin(broadcast(tot))
      .select(col("v"), col("ct"),
        round(graft.functions.Probit.probit(
          col("r2").cast("double") / (lit(2.0) * (col("nn") + 1))) *
          lit(1e9)).cast("long").as("a9"))
    val glob = scored.agg(sum(col("ct")).as("n"),
      sum(d38(col("ct")) * d38(col("a9")) * d38(col("a9"))).as("q18"))
    val perCls = cells.join(scored.select(col("v"), col("a9")), "v")
      .groupBy(col("cls"))
      .agg(sum(col("cnt")).as("nj"),
        sum(d19(col("cnt")) * d19(col("a9"))).as("sj9"))
    perCls.crossJoin(broadcast(glob))
      .groupBy(col("n"), col("q18"))
      // per-class n_j·Ā_j² = S_j²/n_j in a9² units, 1e12-downscaled and
      // pinned so the k-class sum is order-free and fits a long
      .agg(count(lit(1)).as("k"),
        sum(round(col("sj9").cast("double") * col("sj9").cast("double") /
          col("nj") / lit(1e12)).cast("long")).as("num6"))
      .select(col("k"), col("n"),
        round(when(col("k") >= 2 && col("n") > 1 && col("q18") > 0,
          col("num6").cast("double") * lit(1e12) /
            (col("q18").cast("double") / (col("n") - 1))), 4).as("vdw_stat"),
        (col("k") - 1).cast("long").as("df"))
  }

  /** Mood's median test across k classes (Brown & Mood 1951): dichotomize
    * every value at the POOLED lower median, then Pearson chi-square on
    * the 2×k above/not-above table — the bluntest, most assumption-free
    * k-group location test (only medians matter; heavy tails and wild
    * outliers are invisible to it), the screening sibling of
    * [[kruskalWallis]].
    *
    * Exactness: the pooled lower median is found on the distinct-value
    * fold (first value whose inclusive cumulative count reaches
    * ⌈N/2⌉ — an actual data value, no interpolation); all cell counts
    * and margins are exact integers, per-class χ² terms pinned to 9-dp
    * longs before the k-bounded sum. Scale: one value-keyed fold + one
    * class-keyed aggregate; the cumulative window runs on distinct
    * values only. Output `(k, n, median, chi2, df)`; chi2 NULL when the
    * above-margin is degenerate (all or nothing above). */
  def moodMedian(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(1000000)).cast("long").as("v"))
    val byV = q.groupBy(col("v")).agg(count(lit(1)).as("ct"))
    val tot = byV.agg(sum(col("ct")).as("nn"))
    val wc = Window.orderBy(col("v")).rowsBetween(Long.MinValue, 0)
    val med = byV
      .withColumn("cum", sum(col("ct")).over(wc))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= floor((col("nn") + 1) / 2) &&
        col("cum") - col("ct") < floor((col("nn") + 1) / 2))
      .select(col("v").as("medv"))
    val per = q.crossJoin(broadcast(med))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("nj"),
        sum(when(col("v") > col("medv"), 1L).otherwise(0L)).as("gj"))
    val marg = per.agg(sum(col("nj")).as("n"), sum(col("gj")).as("g"),
      count(lit(1)).as("k"))
    per.crossJoin(broadcast(marg)).crossJoin(broadcast(med))
      .groupBy(col("k"), col("n"), col("g"), col("medv"))
      // per-class [(g_j−e_a)²/e_a + ((n_j−g_j)−e_b)²/e_b] at 9 dp —
      // exact-integer inputs, one pinned long per class, order-free sum
      .agg(sum(round(when(col("g") > 0 && col("g") < col("n"), {
        val ea = col("nj").cast("double") * col("g") / col("n")
        val eb = col("nj").cast("double") * (col("n") - col("g")) / col("n")
        ((col("gj") - ea) * (col("gj") - ea) / ea +
          (col("nj") - col("gj") - eb) * (col("nj") - col("gj") - eb) / eb) *
          lit(1e9)
      })).cast("long")).as("t9"))
      .select(col("k"), col("n"),
        round(col("medv").cast("double") / 1e6, 6).as("median"),
        round(when(col("k") >= 2 && col("g") > 0 && col("g") < col("n"),
          col("t9").cast("double") / 1e9), 4).as("chi2"),
        (col("k") - 1).cast("long").as("df"))
  }

  /** Quade test (Quade 1979): the complete-block rank ANOVA that, unlike
    * [[friedman]], WEIGHTS blocks by how much signal they carry (blocks
    * with a wide treatment spread get large block-rank Q_i) — more
    * powerful for small k. Blocks = `blockCol` groups with one cell per
    * treatment (incomplete blocks are dropped — Quade assumes complete
    * blocks); cell value = exact 1e6-quantized SUM of `valueCol`.
    *
    * With doubled midranks R2_ij (within block) and Q2_i (of the block
    * ranges D_i across blocks), `S4_ij = Q2_i·(R2_ij − k − 1) = 4·S_ij`;
    * the 4s cancel in `F = (n−1)·ΣS_j² / (n·ΣS_ij² − ΣS_j²)` so the
    * whole statistic is ONE double division of exact DECIMAL integers.
    * Output `(n_blocks, k, f_stat, df1, df2)`; F is NULL when the
    * denominator degenerates (all blocks tie).
    *
    * Scale: cells are a (block × treatment)-bounded aggregate; both
    * doubled-midrank passes are k-bounded windows inside a block and a
    * blocks-bounded window over the D_i frame. */
  def quade(df: DataFrame, blockCol: Column, treatCol: Column,
            valueCol: Column): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    val cell = df.select(blockCol.as("b"), treatCol.as("t"),
        round(valueCol * lit(1000000)).cast("long").as("xq"))
      .groupBy(col("b"), col("t")).agg(sum(col("xq")).as("x"))
    val kTot = cell.agg(countDistinct(col("t")).as("k"))
    val complete = cell
      .withColumn("bc", count(lit(1)).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(kTot))
      .filter(col("bc") === col("k"))
    // doubled within-block midrank via range frames: 2·#{< x} + #{= x} + 1
    val wLt = Window.partitionBy(col("b")).orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("b")).orderBy(col("x")).rangeBetween(0, 0)
    val ranked = complete
      .withColumn("r2", count(lit(1)).over(wLt) * 2 + count(lit(1)).over(wEq) + 1)
    // block spread D_i and its doubled midrank across blocks
    val spread = ranked.groupBy(col("b"))
      .agg((max(col("x")) - min(col("x"))).as("d"))
    val dLt = Window.orderBy(col("d")).rangeBetween(Window.unboundedPreceding, -1)
    val dEq = Window.orderBy(col("d")).rangeBetween(0, 0)
    val q2 = spread
      .withColumn("q2", count(lit(1)).over(dLt) * 2 + count(lit(1)).over(dEq) + 1)
      .select(col("b"), col("q2"))
    val s4 = ranked.join(broadcast(q2), "b")
      .select(col("t"), col("k"),
        (col("q2") * (col("r2") - col("k") - 1)).as("s4"))
    val perT = s4.groupBy(col("t"), col("k"))
      .agg(sum(d38(col("s4"))).as("sj4"), sum(d38(col("s4")) * d38(col("s4"))).as("aj4"),
        count(lit(1)).as("nb"))
    perT.groupBy(col("k"))
      .agg(max(col("nb")).as("n"), sum(col("aj4")).as("a4"),
        sum(col("sj4") * col("sj4")).as("b4"))
      .select(col("n").as("n_blocks"), col("k"), {
          val n = col("n").cast("double")
          val num = (n - 1) * col("b4").cast("double")
          val den = n * col("a4").cast("double") - col("b4").cast("double")
          round(when(den > 0, num / den), 6).as("f_stat")
        },
        (col("k") - 1).cast("long").as("df1"),
        ((col("n") - 1) * (col("k") - 1)).cast("long").as("df2"))
  }
}
