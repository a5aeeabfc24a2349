package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R×C contingency analysis: Pearson chi-square independence test and
  * Cramér's V effect size for two categorical columns — the
  * general-table extension of [[Experiment]]'s 2×2 conversion test
  * ("does event mix depend on weekday", "does language depend on
  * source").
  *
  * Exactness: observed counts are exact longs; expected counts and the
  * chi-square sum run in double over identical integer inputs
  * (`Σ (o·N − r·c)² / (r·c·N)` — the cross-multiplied form, so no
  * intermediate expected-count rounding), Cramér's
  * `V = sqrt(χ²/(N·(min(R,C)−1)))`.
  *
  * Scale shape: ONE (a, b) hash aggregate over the corpus; margins and
  * the statistic live on the R×C frame (broadcast joins). Cell sums are
  * quantized to 9-dp longs before the final add so the cross-cell
  * summation order cannot drift. */
object Contingency {

  /** First-order partial correlation `r_xy·z` — the association between
    * x and y with the shared driver z regressed out
    * (`(r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))`): the confounder check
    * the plain q30 correlation matrix can't answer ("do clicks and
    * errors co-move, or do both just follow volume?").
    *
    * All nine moment sums (Σx…Σz², Σxy…Σyz) are exact — inputs quantized
    * to 6-dp longs, cross products in DECIMAL(19,0)² — and the three
    * Pearson r's plus the partial formula run in double at the end.
    * One aggregate over the scan; output is one row. */
  def partialCorr(df: DataFrame, x: Column, y: Column, z: Column): DataFrame = {
    def q(c: Column) = round(c * lit(1000000)).cast("long")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val base = df.select(q(x).as("x"), q(y).as("y"), q(z).as("z"))
    val m = base.agg(
      count(lit(1)).as("n"),
      sum(d19(col("x"))).as("sx"), sum(d19(col("y"))).as("sy"),
      sum(d19(col("z"))).as("sz"),
      sum(d19(col("x")) * d19(col("x"))).as("sxx"),
      sum(d19(col("y")) * d19(col("y"))).as("syy"),
      sum(d19(col("z")) * d19(col("z"))).as("szz"),
      sum(d19(col("x")) * d19(col("y"))).as("sxy"),
      sum(d19(col("x")) * d19(col("z"))).as("sxz"),
      sum(d19(col("y")) * d19(col("z"))).as("syz"))
    def r(sab: Column, sa: Column, sb: Column,
          saa: Column, sbb: Column): Column = {
      val n = col("n").cast("double")
      val cov = n * sab.cast("double") - sa.cast("double") * sb.cast("double")
      val va = n * saa.cast("double") - sa.cast("double") * sa.cast("double")
      val vb = n * sbb.cast("double") - sb.cast("double") * sb.cast("double")
      when(va > 0 && vb > 0, cov / sqrt(va * vb))
    }
    m.withColumn("rxy", r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")))
      .withColumn("rxz", r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")))
      .withColumn("ryz", r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")))
      .select(col("n"),
        round(col("rxy"), 6).as("r_xy"),
        round(col("rxz"), 6).as("r_xz"),
        round(col("ryz"), 6).as("r_yz"),
        round({
          val den = (lit(1.0) - col("rxz") * col("rxz")) *
            (lit(1.0) - col("ryz") * col("ryz"))
          when(den > 0,
            (col("rxy") - col("rxz") * col("ryz")) / sqrt(den))
        }, 6).as("r_xy_given_z"))
  }

  /** Cohen's kappa — agreement between two binary judgments beyond
    * chance (label-vs-label, model-vs-model, rater-vs-rater):
    * `κ = (p_o − p_e)/(1 − p_e)` from the exact 2×2 agreement table in
    * ONE scan. The standard check before trusting weak labels. */
  def cohensKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val aa = when(a, 1L).otherwise(0L)
    val bb = when(b, 1L).otherwise(0L)
    df.agg(
        count(lit(1)).as("n"),
        sum(when(aa === 1 && bb === 1, 1L).otherwise(0L)).as("n11"),
        sum(when(aa === 1 && bb === 0, 1L).otherwise(0L)).as("n10"),
        sum(when(aa === 0 && bb === 1, 1L).otherwise(0L)).as("n01"),
        sum(when(aa === 0 && bb === 0, 1L).otherwise(0L)).as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round({
          val n = col("n").cast("double")
          val po = (col("n11") + col("n00")).cast("double") / n
          val pa1 = (col("n11") + col("n10")).cast("double") / n
          val pb1 = (col("n11") + col("n01")).cast("double") / n
          val pe = pa1 * pb1 + (lit(1.0) - pa1) * (lit(1.0) - pb1)
          when(pe =!= 1.0, (po - pe) / (lit(1.0) - pe))
        }, 6).as("kappa"))
  }

  /** One row: `(n, n_rows, n_cols, chi2, dof, cramers_v)` (4 dp). */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val colM = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("nr"), countDistinct(col("b")).as("nc"))
    val terms = cells
      .join(broadcast(rowM), "a").join(broadcast(colM), "b")
      .crossJoin(broadcast(tot))
      // ABSENT cells (o = 0) still contribute e = r·c/N to χ²;
      // enumerating them is avoidable: Σ_all e = N, so
      // χ² = Σ_present[(o−e)²/e − e] + N. Per present cell the bracket
      // is (o·N − r·c)²/(r·c·N) − r·c/N, quantized at 9 dp (signed)
      .select(col("n"), col("nr"), col("nc"),
        round({
          val num = col("o").cast("double") * col("n") -
            col("r").cast("double") * col("c")
          (num * num /
            (col("r").cast("double") * col("c") * col("n")) -
            col("r").cast("double") * col("c") / col("n")) * lit(1e9)
        }).cast("long").as("t9"))
    terms.groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(col("t9")).as("s9"))
      .withColumn("chi2d",
        col("s9").cast("double") / 1e9 + col("n").cast("double"))
      .select(col("n"),
        col("nr").as("n_rows"), col("nc").as("n_cols"),
        round(col("chi2d"), 4).as("chi2"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        round(sqrt(greatest(col("chi2d"), lit(0.0)) /
          (col("n") * (least(col("nr"), col("nc")) - 1))), 4).as("cramers_v"))
  }

  /** Information gain (mutual information, nats) of each categorical
    * feature against a boolean label — the model-free split-quality
    * ranking (what a decision stump would gain; the chi-square's
    * information-theoretic sibling, and the sanity check for q33/q48's
    * model-based importances). One row per feature:
    * `(feature, n, h_label, h_cond, info_gain)`.
    *
    * Determinism: with `x ln x` on exact integer counts (0 ln 0 = 0),
    * `n_v·H_v = n_v ln n_v − pos_v ln pos_v − neg_v ln neg_v` is a pure
    * function of integers, quantized to a 6-dp long per feature value
    * and summed exactly; entropies divide by N once at the end. Scale:
    * one (feature-value)-keyed count aggregate per feature — category-
    * bounded, map-side combined, no row shuffle. */
  /** Adjusted Rand index (Hubert & Arabie 1985) between two categorical
    * partitions of the same rows — pair-counting agreement corrected for
    * chance (the clustering-comparison standard: 1 = identical
    * partitions, ≈0 = independent, < 0 = worse than chance):
    * `ARI = (Σᵢⱼ C(nᵢⱼ,2) − t) / (½[Σᵢ C(aᵢ,2) + Σⱼ C(bⱼ,2)] − t)` with
    * `t = Σᵢ C(aᵢ,2)·Σⱼ C(bⱼ,2)/C(n,2)`.
    *
    * Exactness: every pair count is exact integer/DECIMAL arithmetic off
    * ONE contingency-table scan (cells and both margins derive from the
    * same |A|×|B|-bounded cell frame); the chance correction's rational
    * `t` enters in double only in the final expression. One corpus
    * aggregate; everything downstream is category-bounded. */
  def adjustedRand(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    def c2(c: Column) = // C(x, 2) exact in DECIMAL
      (c.cast("decimal(38,0)") * (c - 1).cast("decimal(38,0)")) / 2
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sij = cells.agg(sum(c2(col("o"))).as("sij"), sum(col("o")).as("n"))
    val sa = cells.groupBy(col("a")).agg(sum(col("o")).as("ai"))
      .agg(sum(c2(col("ai"))).as("sa"))
    val sb = cells.groupBy(col("b")).agg(sum(col("o")).as("bj"))
      .agg(sum(c2(col("bj"))).as("sb"))
    sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"),
        round({
          val t = col("sa").cast("double") * col("sb").cast("double") /
            c2(col("n")).cast("double")
          val half = (col("sa").cast("double") + col("sb").cast("double")) /
            lit(2.0)
          when(half - t =!= 0.0,
            (col("sij").cast("double") - t) / (half - t))
        }, 6).as("ari"))
  }

  def infoGain(df: DataFrame, labelCol: Column,
               features: Seq[(String, Column)]): DataFrame = {
    def xlnx(c: Column): Column =
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(0.0)
    val frames = features.map { case (name, f) =>
      val byV = df.select(f.as("v"), when(labelCol, 1L).otherwise(0L).as("y"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("nv"), sum(col("y")).as("pv"))
      byV.agg(
          sum(col("nv")).as("n"), sum(col("pv")).as("pos"),
          sum(round((xlnx(col("nv")) - xlnx(col("pv")) -
            xlnx(col("nv") - col("pv"))) * lit(1e6)).cast("long")).as("__c6"))
        .select(lit(name).as("feature"), col("n"), {
          val n = col("n").cast("double")
          val hl = (xlnx(col("n")) - xlnx(col("pos")) -
            xlnx(col("n") - col("pos"))) / n
          round(hl, 6).as("h_label")
        }, {
          round(col("__c6").cast("double") / 1e6 /
            col("n").cast("double"), 6).as("h_cond")
        })
        .select(col("feature"), col("n"), col("h_label"), col("h_cond"),
          round(col("h_label") - col("h_cond"), 6).as("info_gain"))
    }
    frames.reduce(_ unionAll _).orderBy(col("feature"))
  }

  /** V-measure clustering evaluation (Rosenberg & Hirschberg 2007) of a
    * cluster assignment against ground-truth classes: one row
    * `(n, h_class, h_cluster, homogeneity, completeness, v_measure)` —
    * homogeneity `1 − H(C|K)/H(C)` punishes mixed clusters, completeness
    * `1 − H(K|C)/H(K)` punishes split classes, V is their harmonic mean.
    * The entropy-based companion of [[adjustedRand]]'s pair counting
    * (ARI rewards agreement; V-measure DECOMPOSES the failure mode).
    *
    * Determinism: every entropy term is `x ln x` over EXACT integer
    * counts off one contingency-cell scan (the [[infoGain]] contract) —
    * per-cell terms 6-dp-quantized and exactly summed; the conditional
    * entropies use `H(C|K) = (Σ_k [n_k ln n_k − Σ_c n_ck ln n_ck])/n`.
    * Convention: H = 0 (perfect) ⇒ score 1; single-class or
    * single-cluster inputs hit the standard 0/0 guards and report 1. */
  def vMeasure(df: DataFrame, classCol: Column, clusterCol: Column): DataFrame = {
    def xlnx(c: Column): Column =
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(0.0)
    val cells = df.groupBy(classCol.as("c"), clusterCol.as("k"))
      .agg(count(lit(1)).as("o"))
    val byC = cells.groupBy(col("c")).agg(sum(col("o")).as("nc"))
    val byK = cells.groupBy(col("k")).agg(sum(col("o")).as("nk"))
    // Σ n_ck ln n_ck once; margins contribute Σ n_c ln n_c / Σ n_k ln n_k
    val cellS = cells.agg(sum(col("o")).as("n"),
      sum(round(xlnx(col("o")) * lit(1e6)).cast("long")).as("o6"))
    val cS = byC.agg(sum(round(xlnx(col("nc")) * lit(1e6)).cast("long")).as("c6"))
    val kS = byK.agg(sum(round(xlnx(col("nk")) * lit(1e6)).cast("long")).as("k6"))
    cellS.crossJoin(broadcast(cS)).crossJoin(broadcast(kS))
      .select(col("n"), {
          val n = col("n").cast("double")
          val hc = (xlnx(col("n")) - col("c6").cast("double") / 1e6) / n
          val hk = (xlnx(col("n")) - col("k6").cast("double") / 1e6) / n
          val hck = (col("k6").cast("double") - col("o6").cast("double")) / 1e6 / n
          val hkc = (col("c6").cast("double") - col("o6").cast("double")) / 1e6 / n
          val hom = when(hc > 0, lit(1.0) - hck / hc).otherwise(1.0)
          val com = when(hk > 0, lit(1.0) - hkc / hk).otherwise(1.0)
          struct(round(hc, 6).as("h_class"), round(hk, 6).as("h_cluster"),
            round(hom, 6).as("homogeneity"), round(com, 6).as("completeness"),
            round(when(hom + com > 0, lit(2.0) * hom * com / (hom + com))
              .otherwise(0.0), 6).as("v_measure")).as("s")
        })
      .select(col("n"), col("s.h_class").as("h_class"),
        col("s.h_cluster").as("h_cluster"), col("s.homogeneity").as("homogeneity"),
        col("s.completeness").as("completeness"), col("s.v_measure").as("v_measure"))
  }

  /** Binary confusion report for a rule/model decision against truth:
    * one row `(tp, fp, fn, tn, precision, recall, f1, balanced_acc,
    * mcc)` — the full 2×2 readout including Matthews correlation, the
    * single-number summary that stays honest under class imbalance
    * (accuracy and even F1 inflate when one class dominates; MCC is the
    * 2×2 Pearson φ). All four counts are one exact aggregate; every
    * metric is a closed form over them (MCC's product terms in double —
    * n² magnitudes overflow nothing at double range and the expression
    * is pinned). NULL MCC/F1 when a margin is empty. */
  def confusionReport(df: DataFrame, predicted: Column, actual: Column): DataFrame =
    df.agg(
        sum(when(predicted && actual, 1L).otherwise(0L)).as("tp"),
        sum(when(predicted && !actual, 1L).otherwise(0L)).as("fp"),
        sum(when(!predicted && actual, 1L).otherwise(0L)).as("fn"),
        sum(when(!predicted && !actual, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))), 6).as("precision"),
        round(when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))), 6).as("recall"),
        round(when(col("tp") * 2 + col("fp") + col("fn") > 0,
          lit(2.0) * col("tp") / (col("tp") * 2 + col("fp") + col("fn"))), 6)
          .as("f1"),
        round(when((col("tp") + col("fn")) > 0 && (col("tn") + col("fp")) > 0,
          (col("tp").cast("double") / (col("tp") + col("fn")) +
            col("tn").cast("double") / (col("tn") + col("fp"))) / 2), 6)
          .as("balanced_acc"),
        round({
          val den = sqrt((col("tp") + col("fp")).cast("double") *
            (col("tp") + col("fn")).cast("double") *
            (col("tn") + col("fp")).cast("double") *
            (col("tn") + col("fn")).cast("double"))
          when(den > 0,
            (col("tp").cast("double") * col("tn").cast("double") -
              col("fp").cast("double") * col("fn").cast("double")) / den)
        }, 6).as("mcc"))

  /** Precision-recall curve over a literal threshold grid for a scored
    * binary decision (`score >= t` predicts positive): one row per
    * threshold `(threshold, tp, fp, fn, precision, recall, f1)` — the
    * operating-point sweep [[confusionReport]] freezes at one point
    * (threshold CHOICE is the actual product decision; the curve is
    * what chooses it). ONE corpus aggregate: each row contributes to
    * every threshold via conditional sums over the
    * thresholds×{tp,fp,fn} cells — the grid is literal and tiny, so the
    * fan-out is a broadcast cross join, category-bounded. */
  def prCurve(df: DataFrame, score: Column, actual: Column,
              thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold required")
    val spark = df.sparkSession
    import spark.implicits._
    val grid = broadcast(thresholds.toDF("threshold"))
    df.select(score.as("s"), actual.as("a"))
      .crossJoin(grid)
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("s") >= col("threshold") && col("a"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("threshold") && !col("a"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("s") < col("threshold") && col("a"), 1L).otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        round(when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))), 6).as("precision"),
        round(when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))), 6).as("recall"),
        round(when(col("tp") * 2 + col("fp") + col("fn") > 0,
          lit(2.0) * col("tp") / (col("tp") * 2 + col("fp") + col("fn"))), 6)
          .as("f1"))
      .orderBy(col("threshold"))
  }

  /** Cochran's Q — the k-treatment binary repeated-measures test (the
    * binary specialization of [[RankStats.friedman]], and McNemar's
    * k-arm generalization): across user blocks, does the probability of
    * "did treatment j at least once" differ by treatment?
    * `Q = (k−1)(k·ΣC_j² − N²) / (k·N − ΣR_i²)` over the 0/1 incidence
    * matrix — EVERY term an exact integer off two bounded aggregates
    * (column totals per treatment, row totals per user), one division
    * at the end. One row: `(n_users, k, q)` at 4 dp.
    *
    * Scale shape: one (user, treatment)-keyed dedup aggregate folds the
    * corpus; column totals are treatment-bounded, the row-total moment
    * is a user-keyed aggregate — no grid is ever built (absent cells
    * are zeros that no Q term needs materialized). */
  def cochranQ(df: DataFrame, unitCol: Column, treatmentCol: Column): DataFrame = {
    val inc = df.select(unitCol.as("u"), treatmentCol.as("t")).distinct()
    val k = inc.select(col("t")).distinct().count()
    def d(c: Column) = c.cast("decimal(38,0)")
    val colTot = inc.groupBy(col("t")).agg(count(lit(1)).as("cj"))
      .agg(sum(d(col("cj"))).as("n"), sum(d(col("cj")) * d(col("cj"))).as("scj2"))
    val rowTot = inc.groupBy(col("u")).agg(count(lit(1)).as("ri"))
      .agg(count(lit(1)).as("n_users"), sum(d(col("ri")) * d(col("ri")))
        .as("sri2"))
    rowTot.crossJoin(broadcast(colTot))
      .select(col("n_users"), lit(k).as("k"),
        round({
          val kk = lit(k.toDouble)
          val num = (kk - 1) * (kk * col("scj2").cast("double") -
            col("n").cast("double") * col("n").cast("double"))
          val den = kk * col("n").cast("double") - col("sri2").cast("double")
          when(den > 0, num / den)
        }, 4).as("q"))
  }

  /** McNemar's test of marginal change on paired binaries — did the
    * per-user outcome rate CHANGE between the first and second half of
    * the study window (the before/after question a two-sample test gets
    * wrong by ignoring the pairing): discordant counts
    * `b` (yes→no), `c` (no→yes), `χ² = (b−c)²/(b+c)` (no continuity
    * correction, documented). The midpoint day is the integer-exact
    * `min_day + (max_day − min_day) div 2` — engine-identical. One row:
    * `(n_units, b, c, chi2)` at 4 dp.
    *
    * Scale shape: one 2-row min/max broadcast, one user-keyed corpus
    * aggregate, a 1-row rollup. */
  def mcnemar(df: DataFrame, unitCol: Column, tsCol: Column,
              outcome: Column): DataFrame = {
    val span = df.agg(min(to_date(tsCol)).as("d0"), max(to_date(tsCol)).as("d1"))
    val mid = df.crossJoin(broadcast(span))
      .select(unitCol.as("u"),
        (to_date(tsCol) <= date_add(col("d0"),
          // floor first: an int CAST of the double quotient truncates in
          // Spark but ROUNDS in DuckDB — floor() is the engine-identical
          // form
          floor(datediff(col("d1"), col("d0")) / 2).cast("int"))).as("h1"),
        outcome.as("o"))
    val per = mid.groupBy(col("u"))
      .agg(max(when(col("h1") && col("o"), 1L).otherwise(0L)).as("p1"),
        max(when(!col("h1") && col("o"), 1L).otherwise(0L)).as("p2"))
    per.agg(
        count(lit(1)).as("n_units"),
        sum(when(col("p1") === 1 && col("p2") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("p1") === 0 && col("p2") === 1, 1L).otherwise(0L)).as("c"))
      .select(col("n_units"), col("b"), col("c"),
        round(when(col("b") + col("c") > 0,
          (col("b") - col("c")).cast("double") *
            (col("b") - col("c")).cast("double") /
            (col("b") + col("c")).cast("double")), 4).as("chi2"))
  }

  /** Weight-of-evidence / information-value table of a categorical
    * feature against a binary target — the credit-scoring readout of
    * [[infoGain]]'s question: per category,
    * `WoE = ln((pos_i/POS)/(neg_i/NEG))` and its IV contribution
    * `(pos_i/POS − neg_i/NEG)·WoE`; the summed IV is the standard
    * "predictive power" scale (< 0.02 useless, > 0.3 strong).
    * Categories with a zero margin get null WoE (the honest answer; the
    * ±0.5 Laplace variant is a caller-side remap). Output per category:
    * `(cat, n, pos, neg, woe, iv_term, iv_total)` at 6 dp — iv_total
    * repeated per row off the pinned per-category terms (12-dp longs,
    * exact sum). One hash aggregate + a 2-row margin broadcast. */
  def woeIv(df: DataFrame, catCol: Column, target: Column): DataFrame = {
    val cells = df.select(catCol.as("cat"),
        when(target, 1L).otherwise(0L).as("y"))
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val tot = cells.agg(sum(col("pos")).as("tp"), sum(col("neg")).as("tn"))
    val terms = cells.crossJoin(broadcast(tot))
      .select(Seq(col("cat"), col("n"), col("pos"), col("neg")) ++ {
        val pr = col("pos").cast("double") / col("tp")
        val nr = col("neg").cast("double") / col("tn")
        val woe = when(col("pos") > 0 && col("neg") > 0 &&
          col("tp") > 0 && col("tn") > 0, log(pr / nr))
        Seq(round(woe, 6).as("woe"),
          round((pr - nr) * woe, 6).as("iv_term"),
          round((pr - nr) * woe * lit(1e12)).cast("long").as("__iv12"))
      }: _*)
    val ivTot = terms.agg(sum(col("__iv12")).as("__iv12t"))
    terms.crossJoin(broadcast(ivTot))
      .select(col("cat"), col("n"), col("pos"), col("neg"), col("woe"),
        col("iv_term"),
        round(col("__iv12t").cast("double") / 1e12, 6).as("iv_total"))
      .orderBy(col("cat"))
  }

  /** Standardized Pearson residuals per cell of the `aCol × bCol`
    * contingency table — the POST-HOC readout behind [[chiSquare]]'s
    * omnibus verdict: WHICH cells drive the dependence, as
    * `r_ij = (O − E)/√(E(1−p_i·)(1−p·_j))` (Agresti's adjusted
    * residuals, ~N(0,1) under independence, so |r| > 2 flags a cell).
    * Absent combinations enter as true O = 0 cells via the margin grid.
    *
    * Exactness: O, margins and N are exact integers off one cell scan;
    * E and the residual are single double expressions over them —
    * identical on both engines, no cross-row float accumulation at all.
    * Scale: one corpus aggregate; the grid is |A|×|B|-bounded. Output
    * one row per cell `(a, b, o, e, std_resid)` at 4 dp, residual NULL
    * when a margin is total (single row/column table). */
  def cellResiduals(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val colM = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    rowM.crossJoin(broadcast(colM)).crossJoin(broadcast(tot))
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("o"), lit(0L)).as("o"),
        col("r"), col("c"), col("n"))
      .select(col("a"), col("b"), col("o"), {
        val e = col("r").cast("double") * col("c") / col("n")
        round(e, 4).as("e")
      }, {
        val e = col("r").cast("double") * col("c") / col("n")
        val den = e * (lit(1.0) - col("r").cast("double") / col("n")) *
          (lit(1.0) - col("c").cast("double") / col("n"))
        round(when(den > 0, (col("o") - e) / sqrt(den)), 4).as("std_resid")
      })
      .orderBy(col("a"), col("b"))
  }

  /** Cochran-Armitage test for TREND in a 2×k table with ordered dose
    * groups (Armitage 1955): does the success rate move MONOTONICALLY
    * with the ordered score — one df against the ordered alternative,
    * where [[chiSquare]]'s (k−1)-df omnibus dilutes its power across
    * unordered departures. `scoreCol` must be the integer dose score
    * (0,1,2,…); conventional equally-spaced scores are the default
    * reading.
    *
    * Exactness: everything up to the final z is INTEGER — per-group
    * (n_j, r_j) counts and the score moments Σt·n, Σt²·n, Σt·r are
    * exact DECIMAL sums, so T, E[T] and Var[T] come from the textbook
    * closed forms over exact integers with doubles only in the last
    * division. One group-keyed aggregate (k-bounded) + a 1-row fold.
    * Output: `(k, n, cases, z, p_two)` — z at 6 dp, two-sided p at
    * 4 dp via the shared [[graft.functions.Phi]]. */
  def cochranArmitage(df: DataFrame, scoreCol: Column, target: Column): DataFrame = {
    val cells = df.select(scoreCol.cast("long").as("t"),
        when(target, 1L).otherwise(0L).as("y"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("nj"), sum(col("y")).as("rj"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    cells.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
        sum(col("rj")).as("r"),
        sum(d19(col("t")) * d19(col("nj"))).as("stn"),
        sum(d19(col("t")) * d19(col("t")) * d19(col("nj"))).as("st2n"),
        sum(d19(col("t")) * d19(col("rj"))).as("str"))
      .select(col("k"), col("n"), col("r").as("cases"), {
        val n = col("n").cast("double")
        val rr = col("r").cast("double")
        val tstat = col("str").cast("double") -
          rr * col("stn").cast("double") / n
        val varT = rr * (n - rr) / (n * n * (n - 1)) *
          (n * col("st2n").cast("double") -
            col("stn").cast("double") * col("stn").cast("double"))
        when(col("k") >= 2 && varT > 0, tstat / sqrt(varT))
      }.as("z0"))
      .select(col("k"), col("n"), col("cases"),
        round(col("z0"), 6).as("z"),
        round(lit(2.0) * (lit(1.0) -
          graft.functions.Phi.phi(abs(col("z0")))), 4).as("p_two"))
  }
}
