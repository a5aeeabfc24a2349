package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater / inter-measurement agreement statistics beyond the
  * two-rater Cohen's kappa ([[Contingency.cohensKappa]]): Fleiss' kappa
  * for ANY fixed number of raters (the weak-supervision "do my labeling
  * functions agree" readout), the one-way intraclass correlation
  * (variance-decomposition agreement of repeated numeric measures), and
  * Lin's concordance correlation (agreement of two continuous
  * measurements against the 45° line — Pearson r rewards any linear
  * relation; CCC additionally punishes scale and location shift).
  *
  * Reference frame: reference queries audit one pipeline against
  * another (`process_logs_v10.py:214` compares rule outputs); these
  * operators give that comparison a calibrated chance-corrected scale.
  *
  * Exactness: every statistic reduces to integer tallies (label-cell
  * counts, 6-dp-quantized value sums and cross-products) aggregated in
  * DECIMAL, with ONE final double expression per output — the house
  * determinism contract (identical IEEE expression in the DuckDB twin).
  *
  * Scale shape: single hash-aggregates over the corpus; the per-subject
  * frame for Fleiss is |subjects|-bounded and immediately re-aggregated;
  * nothing is ever collected or row-ranked.
  */
object Agreement {

  private def d19(c: Column) = c.cast("decimal(19,0)")
  private def d38(c: Column) = c.cast("decimal(38,0)")

  /** Fleiss' kappa over r raters (one column per rater, each a
    * categorical label for the row's subject). One row:
    * `(n_subjects, n_raters, n_categories, p_bar, p_e, kappa)` at 6 dp.
    *
    * `P_i = (Σ_j n_ij² − r)/(r(r−1))` per subject, `P̄` their mean;
    * `P_e = Σ_j p_j²` computed as the exact-integer form
    * `(Σ_j C_j²)/(N·r)²` where `C_j` is the category's global count —
    * so no order-dependent double summation anywhere. */
  def fleissKappa(df: DataFrame, idCol: Column,
                  raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2, s"need >= 2 raters: ${raters.size}")
    val r = raters.size
    val stacked = df.select(idCol.as("id"),
        explode(array(raters.map(_.cast("string")): _*)).as("cat"))
    val cells = stacked.groupBy(col("id"), col("cat"))
      .agg(count(lit(1)).as("cnt"))
    // Σ_j n_ij² per subject → corpus-wide ΣΣ n² (exact); subjects count
    val subj = cells.groupBy(col("id"))
      .agg(sum(d19(col("cnt")) * d19(col("cnt"))).as("sq"))
    val sa = subj.agg(count(lit(1)).as("n"), sum(col("sq")).as("ssq"))
    val catTot = cells.groupBy(col("cat")).agg(sum(col("cnt")).as("c_j"))
    val ca = catTot.agg(count(lit(1)).as("k"),
      sum(d38(col("c_j")) * d38(col("c_j"))).as("csq"))
    sa.crossJoin(broadcast(ca)).select({
      val n = col("n").cast("double")
      val pBar = (col("ssq").cast("double") - n * r) /
        (n * r * (r - 1))
      val pE = col("csq").cast("double") / (n * r) / (n * r)
      Seq(col("n").as("n_subjects"), lit(r.toLong).as("n_raters"),
        col("k").as("n_categories"),
        round(pBar, 6).as("p_bar"), round(pE, 6).as("p_e"),
        round(when(pE < 1, (pBar - pE) / (lit(1.0) - pE)), 6).as("kappa"))
    }: _*)
  }

  /** One-way random-effects intraclass correlation ICC(1,1) of
    * `valueCol` within the groups of `groupCol`, unequal group sizes
    * handled by the standard `k₀ = (N − Σn_i²/N)/(g−1)` effective group
    * size. One row: `(n, n_groups, msb, msw, icc1)` — mean squares in
    * value units², 6 dp.
    *
    * The per-group term `S_i²/n_i` is pinned to an integer once (one
    * deterministic double expression over exact sums, the
    * [[RankStats.kruskalWallis]] pattern) so the cross-group sum is
    * order-invariant. */
  def icc(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(groupCol.as("g"),
      round(valueCol * lit(1000000)).cast("long").as("yq"))
    val rows = q.agg(count(lit(1)).as("n_r"),
      sum(d38(col("yq")) * d38(col("yq"))).as("ssq"))
    val cls = q.groupBy(col("g"))
      .agg(count(lit(1)).as("n_i"), sum(d19(col("yq"))).as("s_i"))
      .select(col("n_i"),
        round(col("s_i").cast("double") * col("s_i").cast("double") /
          col("n_i").cast("double")).cast("decimal(38,0)").as("u"),
        (d38(col("n_i")) * d38(col("n_i"))).as("n2"),
        d38(col("s_i")).as("s_i"))
    val ga = cls.agg(count(lit(1)).as("g_n"), sum(col("n_i")).as("n"),
      sum(col("u")).as("su"), sum(col("n2")).as("sn2"),
      sum(col("s_i")).as("s"))
    ga.crossJoin(broadcast(rows)).select({
      val n = col("n").cast("double"); val g = col("g_n").cast("double")
      val ssb = col("su").cast("double") -
        col("s").cast("double") * col("s").cast("double") / n
      val ssw = col("ssq").cast("double") - col("su").cast("double")
      val msb = ssb / (g - 1); val msw = ssw / (n - g)
      val k0 = (n - col("sn2").cast("double") / n) / (g - 1)
      Seq(col("n"), col("g_n").as("n_groups"),
        round(msb / 1e12, 6).as("msb"), round(msw / 1e12, 6).as("msw"),
        round(when(msb + (k0 - 1) * msw =!= 0,
          (msb - msw) / (msb + (k0 - 1) * msw)), 6).as("icc1"))
    }: _*)
  }

  /** Lin's concordance correlation between paired measurements:
    * `CCC = 2s_xy / (s_x² + s_y² + (x̄−ȳ)²)` — one row
    * `(n, pearson_r, c_b, ccc)` at 6 dp, where `c_b = CCC/r` is the
    * bias-correction factor (how far the best-fit line sits from the
    * 45° identity). Population (1/n) moments, per Lin 1989. */
  def linCcc(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val q = df.select(round(xCol * lit(1000000)).cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
    q.agg(count(lit(1)).as("n"),
        sum(d19(col("x"))).as("sx"), sum(d19(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"))
      .select({
        val n = col("n").cast("double")
        val vx = col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / n
        val vy = col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double") / n
        val cxy = col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") / n
        val dm = (col("sx").cast("double") - col("sy").cast("double")) / n
        val r = when(vx > 0 && vy > 0, cxy / sqrt(vx * vy))
        val ccc = when(vx + vy + n * dm * dm > 0,
          lit(2.0) * cxy / (vx + vy + n * dm * dm))
        Seq(col("n"), round(r, 6).as("pearson_r"),
          round(when(r =!= 0, ccc / r), 6).as("c_b"),
          round(ccc, 6).as("ccc"))
      }: _*)
  }

  /** Krippendorff's α, nominal metric (Krippendorff 2004) — the
    * agreement coefficient that handles MISSING data and any number of
    * raters per unit, where [[fleissKappa]] needs a constant rater
    * count. Units = `unitCol` groups; every row is one categorical
    * rating `catCol` of its unit; units with < 2 ratings carry no
    * pairable information and are dropped (the standard treatment).
    *
    * From the coincidence matrix: `D_o = Σ_u (n_u² − Σ_c n_uc²)/(n_u−1)`
    * (pairable disagreements), `D_e = (N² − Σ_c n_c²)/(N−1)`, and
    * `α = 1 − D_o/D_e`. One row `(n_units, n_ratings, alpha)`.
    *
    * Exactness: the only per-unit division is pinned to a 9-dp long
    * (exact integers in, identical double out on both engines), so the
    * cross-unit sum is order-free; the closing α is one double ratio.
    * Scale: a (unit × category) aggregate, a unit-level fold, two
    * category-bounded margins — nothing downstream scales with rows. */
  def krippendorffAlpha(df: DataFrame, unitCol: Column,
                        catCol: Column): DataFrame = {
    val uc = df.select(unitCol.as("u"), catCol.as("c"))
      .groupBy(col("u"), col("c")).agg(count(lit(1)).as("nuc"))
    val perU = uc.groupBy(col("u"))
      .agg(sum(col("nuc")).as("nu"),
        sum(d38(col("nuc")) * d38(col("nuc"))).as("squc"))
      .filter(col("nu") >= 2)
    // margins restricted to pairable units
    val kept = uc.join(perU.select(col("u")), "u")
    val marg = kept.groupBy(col("c")).agg(sum(col("nuc")).as("nc"))
      .agg(sum(col("nc")).as("nn"),
        sum(d38(col("nc")) * d38(col("nc"))).as("sqc"))
    val doSum = perU.agg(
      count(lit(1)).as("n_units"),
      sum(round((d38(col("nu")) * d38(col("nu")) - col("squc"))
          .cast("double") * lit(1e9) / (col("nu") - 1)).cast("long"))
        .as("do9"))
    doSum.crossJoin(broadcast(marg))
      .select(col("n_units"), col("nn").as("n_ratings"), {
        val nD = col("nn").cast("double")
        val dObs = col("do9").cast("double") / 1e9
        val dExp = (nD * nD - col("sqc").cast("double")) / (nD - 1)
        round(when(dExp > 0, lit(1.0) - dObs * (nD - 1) /
          (nD * nD - col("sqc").cast("double"))), 6).as("alpha")
      })
  }

  /** Kendall's coefficient of concordance W (tie-corrected, Legendre
    * form) over complete blocks: how consistently do the blocks rank
    * the k treatments? `W = 3·S4 / (n²·k·(k²−1) − n·ΣT_b)` where S4 is
    * the doubled-midrank column-sum dispersion `Σ_j (R2_j − n(k+1))²`
    * and `T_b = Σ(t³−t)` over each block's tie groups — ONE double
    * division of exact DECIMAL integers. Blocks missing a treatment are
    * dropped. Output `(n_blocks, k, w, chi2, df)`; χ² = n(k−1)W. */
  def kendallW(df: DataFrame, blockCol: Column, treatCol: Column,
               valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = df.select(blockCol.as("b"), treatCol.as("t"),
        round(valueCol * lit(1000000)).cast("long").as("xq"))
      .groupBy(col("b"), col("t")).agg(sum(col("xq")).as("x"))
    val kTot = cell.agg(countDistinct(col("t")).as("k"))
    val complete = cell
      .withColumn("bc", count(lit(1)).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(kTot))
      .filter(col("bc") === col("k"))
    val wLt = Window.partitionBy(col("b")).orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("b")).orderBy(col("x")).rangeBetween(0, 0)
    val ranked = complete
      .withColumn("r2", count(lit(1)).over(wLt) * 2 + count(lit(1)).over(wEq) + 1)
      .withColumn("teq", count(lit(1)).over(wEq))
    // per-block tie term ΣT_b: each tied group of size t contributes
    // t³−t; summing (t²−1) per MEMBER gives the same total
    val ties = ranked.agg(sum(d38(col("teq")) * d38(col("teq")) - 1).as("tsum"),
      countDistinct(col("b")).as("n"))
    val perT = ranked.groupBy(col("t")).agg(sum(col("r2")).as("r2j"))
    val disp = perT.crossJoin(broadcast(ties))
      .crossJoin(broadcast(kTot))
      .groupBy(col("n"), col("k"), col("tsum"))
      .agg(sum((d38(col("r2j")) - d38(col("n")) * (d38(col("k")) + 1)) *
        (d38(col("r2j")) - d38(col("n")) * (d38(col("k")) + 1))).as("s4"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val den = nD * nD * kD * (kD * kD - 1) - nD * col("tsum").cast("double")
    val wCoef = when(den > 0, col("s4").cast("double") * 3 / den)
    disp.select(col("n").as("n_blocks"), col("k"),
      round(wCoef, 6).as("w"),
      round(nD * (kD - 1) * wCoef, 4).as("chi2"),
      (col("k") - 1).cast("long").as("df"))
  }

  /** Bland-Altman agreement between two paired measurements per unit
    * (Bland & Altman 1986) — the limits-of-agreement readout [[linCcc]]
    * summarizes to one number: mean difference (bias), SD of
    * differences, LoA = bias ± 1.96·SD, and the share of units inside
    * the limits. Inputs are per-unit 6-dp-pinned means (exact-integer
    * ratios rounded identically on both engines); moments of the
    * pinned differences are exact DECIMALs. */
  def blandAltman(a: DataFrame, b: DataFrame, unitCol: String,
                  vCol: String): DataFrame = {
    val pa = a.select(col(unitCol).as("u"), col(vCol).as("va"))
    val pb = b.select(col(unitCol).as("u"), col(vCol).as("vb"))
    val d = pa.join(pb, "u")
      .select((round(col("va") * 1e6).cast("long") -
        round(col("vb") * 1e6).cast("long")).as("dq"))
    val m = d.agg(count(lit(1)).as("n"),
      sum(d38(col("dq"))).as("sd1"),
      sum(d38(col("dq")) * d38(col("dq"))).as("sdd"))
    val n = col("n").cast("double")
    val mean = col("sd1").cast("double") / n / 1e6
    val sd = sqrt((col("sdd").cast("double") -
      col("sd1").cast("double") * col("sd1").cast("double") / n) /
      (n - 1)) / 1e6
    val lo = mean - sd * 1.96
    val hi = mean + sd * 1.96
    val stats = m.select(col("n"), round(mean, 6).as("mean_diff"),
      round(when(col("n") >= 2, sd), 6).as("sd_diff"),
      round(when(col("n") >= 2, lo), 6).as("loa_lower"),
      round(when(col("n") >= 2, hi), 6).as("loa_upper"))
    // pct inside the limits: one more pass over the pinned differences
    // against the UNROUNDED limits (broadcast scalar row)
    // n < 2 → sd/limits are undefined: gate like sd_diff/loa_* so the
    // degenerate case reads null rather than counting every row outside
    val within = d.crossJoin(broadcast(m))
      .agg((sum(when(col("dq").cast("double") / 1e6 >= lo &&
        col("dq").cast("double") / 1e6 <= hi, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("raw"), first(col("n")).as("__n"))
      .select(round(when(col("__n") >= 2, col("raw")), 6).as("pct_within"))
    stats.crossJoin(within)
  }
}
