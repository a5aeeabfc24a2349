package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dependence tests beyond correlation — Pearson (q12) sees lines,
  * Spearman (q214) sees monotone curves; these two see ANYTHING:
  *
  *  - Hoeffding's D (1948): rank-based, consistent against every
  *    dependence with continuous marginals — the U-shaped relation both
  *    correlations score ≈ 0 lights up here.
  *  - Distance correlation (Székely, Rizzo & Bakirov 2007): dCor = 0
  *    IFF independent; the double-centered distance-product moment.
  *
  * Both are PAIR-QUADRATIC in their input rows by definition, so the
  * engine contract is the same as the matrix-profile/Theil-Sen family:
  * callers feed a BOUNDED frame (daily aggregates, strata summaries —
  * never raw events). Inputs are 1e6-quantized exact longs; every
  * pairwise term is pinned to a long before the order-free sums. */
object Dependence {

  private def d38(c: Column) = c.cast("decimal(38,0)")

  /** Hoeffding's D over rows `(xCol, yCol)` (tie-free formulation with
    * midranks — document-level ties in 1e6-quantized daily sums are
    * measure-zero; both engines share the convention either way):
    * with 1-based midranks R, S and the bivariate dominance count
    * `Q_i = #{j≠i : x_j < x_i ∧ y_j < y_i}`,
    * `D1 = ΣQ(Q−1)`, `D2 = Σ(R−1)(R−2)(S−1)(S−2)`,
    * `D3 = Σ(R−2)(S−2)Q`, and
    * `D = 30·[(n−2)(n−3)D1 + D2 − 2(n−2)D3] / [n(n−1)(n−2)(n−3)(n−4)]`.
    * One row `(n, d_stat)`, d at 6 dp, NULL for n < 5. D ∈ [−0.5, 1];
    * 0 under independence. */
  def hoeffdingD(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(round(xCol * lit(1000000)).cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
    // midranks via range-frame counts (rows-bounded input by contract)
    def mid(c: String) = {
      val lt = Window.orderBy(col(c)).rangeBetween(Window.unboundedPreceding, -1)
      val eq = Window.orderBy(col(c)).rangeBetween(0, 0)
      (count(lit(1)).over(lt).cast("double") +
        (count(lit(1)).over(eq).cast("double") + 1) / 2)
    }
    val ranked = base
      // deterministic row key: duplicate (x, y) rows must each keep
      // their own Q count, not collapse in the aggregate below
      .withColumn("rid", row_number().over(Window.orderBy(col("x"), col("y"))))
      .withColumn("r", mid("x"))
      .withColumn("s", mid("y"))
    // Q by self-join: strict double dominance
    val qcnt = ranked.alias("a")
      .join(base.alias("b"),
        col("b.x") < col("a.x") && col("b.y") < col("a.y"), "left")
      .groupBy(col("a.rid"), col("a.r"), col("a.s"))
      .agg(sum(when(col("b.x").isNotNull, 1L).otherwise(0L)).as("q"))
    val terms = qcnt.agg(
      count(lit(1)).as("n"),
      sum(d38(col("q")) * d38(col("q") - 1)).as("d1"),
      // R,S are midranks (can be half-integers): doubled to stay exact
      sum(d38((col("r") * 2 - 2).cast("long")) *
        d38((col("r") * 2 - 4).cast("long")) *
        d38((col("s") * 2 - 2).cast("long")) *
        d38((col("s") * 2 - 4).cast("long"))).as("d2x16"),
      sum(d38((col("r") * 2 - 4).cast("long")) *
        d38((col("s") * 2 - 4).cast("long")) * d38(col("q"))).as("d3x4"))
    val n = col("n").cast("double")
    val d1 = col("d1").cast("double")
    val d2 = col("d2x16").cast("double") / 16
    val d3 = col("d3x4").cast("double") / 4
    val dStat = ((n - 2) * (n - 3) * d1 + d2 - (n - 2) * d3 * 2) * 30 /
      (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    terms.select(col("n"),
      round(when(col("n") >= 5, dStat), 6).as("d_stat"))
  }

  /** Distance correlation over rows `(xCol, yCol)`: double-centered
    * distance matrices `A, B`; `dCov² = ΣA∘B/n²`,
    * `dCor = dCov/√(dVarX·dVarY)`. One row
    * `(n, dcov, dvar_x, dvar_y, dcor)` (6 dp; NULL dcor when a
    * marginal is constant). Pairwise |Δ| are exact quantized longs;
    * the centered products are pinned to 6-dp longs before the
    * order-free sums (n²-bounded by the caller's contract). */
  def distanceCorr(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(round(xCol * lit(1000000)).cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
      .withColumn("i", row_number().over(Window.orderBy(col("x"), col("y"))))
    val pairs = base.alias("a").join(base.alias("b"), lit(true))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        abs(col("a.x") - col("b.x")).as("dxq"),
        abs(col("a.y") - col("b.y")).as("dyq"))
    // means as EXACT integer sums with one terminal division each —
    // avg() of doubles accumulates in partition order and the two
    // engines would disagree at the last ulp
    val rowMeans = pairs.groupBy(col("i"))
      .agg((sum(d38(col("dxq"))).cast("double") / count(lit(1))).as("mxi"),
        (sum(d38(col("dyq"))).cast("double") / count(lit(1))).as("myi"))
    val colMeans = pairs.groupBy(col("j"))
      .agg((sum(d38(col("dxq"))).cast("double") / count(lit(1))).as("mxj"),
        (sum(d38(col("dyq"))).cast("double") / count(lit(1))).as("myj"))
    val grand = pairs.agg(
      (sum(d38(col("dxq"))).cast("double") / count(lit(1))).as("mx"),
      (sum(d38(col("dyq"))).cast("double") / count(lit(1))).as("my"),
      count(lit(1)).as("nsq"))
    val centered = pairs
      .join(broadcast(rowMeans), "i").join(broadcast(colMeans), "j")
      .crossJoin(broadcast(grand))
      .select(col("nsq"),
        (col("dxq").cast("double") - col("mxi") - col("mxj") + col("mx")).as("ac"),
        (col("dyq").cast("double") - col("myi") - col("myj") + col("my")).as("bc"))
    // per-cell products pinned at 6 dp (quanta² units) → exact sums
    val agg = centered.agg(max(col("nsq")).as("nsq"),
      sum(round(col("ac") * col("bc") / lit(1e6)).cast("long")
        .cast("decimal(38,0)")).as("sab6"),
      sum(round(col("ac") * col("ac") / lit(1e6)).cast("long")
        .cast("decimal(38,0)")).as("saa6"),
      sum(round(col("bc") * col("bc") / lit(1e6)).cast("long")
        .cast("decimal(38,0)")).as("sbb6"))
    val nsq = col("nsq").cast("double")
    // back to value units: quanta²·1e-6 scaling / 1e12·1e-6 ... the
    // common 1e6 pin and the 1e12 quanta² cancel in dCor; absolute
    // dcov/dvar are reported in (1e-3·value)² units via /1e6
    def m(c: Column) = c.cast("double") / nsq
    val dcov2 = m(col("sab6"))
    val dvx = m(col("saa6"))
    val dvy = m(col("sbb6"))
    agg.select(sqrt(nsq).cast("long").as("n"),
      round(signum(dcov2) * sqrt(abs(dcov2)) / 1e3, 6).as("dcov"),
      round(sqrt(dvx) / 1e3, 6).as("dvar_x"),
      round(sqrt(dvy) / 1e3, 6).as("dvar_y"),
      round(when(dvx > 0 && dvy > 0,
        signum(dcov2) * sqrt(abs(dcov2)) / sqrt(sqrt(dvx * dvy))), 6)
        .as("dcor"))
  }
}
