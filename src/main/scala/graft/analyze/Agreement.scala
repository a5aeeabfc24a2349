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
}
