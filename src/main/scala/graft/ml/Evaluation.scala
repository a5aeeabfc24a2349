package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Positional

/** Probabilistic-score evaluation: reliability (calibration) table with
  * Brier score, and the decile lift/gains table — the business-facing
  * half of model eval next to [[Models.binaryMetrics]]' AUC (AUC ranks;
  * these ask "are the probabilities honest" and "how much better than
  * random is acting on the top slice").
  *
  * Exactness: scores are 6-dp quantized longs, so per-bin mean scores,
  * observed rates and the per-row Brier term `(s − y)²` are exact
  * integer arithmetic summed in DECIMAL; deciles come from
  * range-partitioned global ranks ([[Positional.withRowIndex]] — no
  * SinglePartition window) with the exact `(rank−1)·10 div n` rule.
  */
object Evaluation {

  /** `(bin, n, mean_score, obs_rate, brier)` over 10 equal-width score
    * bins in [0,1]; `brier` is the GLOBAL Brier score repeated per row
    * (single-scan convenience). `target` must evaluate to 0/1. */
  def calibrationReport(df: DataFrame, score: Column, target: Column): DataFrame = {
    val sq = round(score * lit(1000000)).cast("long")
    val y = when(target, 1L).otherwise(0L)
    val base = df.select(sq.as("sq"), y.as("y"))
      .withColumn("bin", least(floor(col("sq") / 100000L), lit(9L)))
      .withColumn("e2",
        (col("sq") - col("y") * 1000000L).cast("decimal(19,0)") *
          (col("sq") - col("y") * 1000000L).cast("decimal(19,0)"))
    val tot = base.agg(
      (sum(col("e2")).cast("double") /
        count(lit(1)) / lit(1e12)).as("__brier"))
    base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("sq")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_score"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6).as("obs_rate"))
      .crossJoin(broadcast(tot))
      .withColumn("brier", round(col("__brier"), 6))
      .drop("__brier")
      .orderBy(col("bin"))
  }

  /** Decile lift table ordered by score DESC: `(decile, n, responders,
    * response_rate, lift, cum_capture)` — decile 1 is the top-scored
    * tenth; `lift` vs the overall rate; `cum_capture` = share of all
    * responders reached through this decile. */
  def liftTable(df: DataFrame, idCol: String, score: Column,
                target: Column): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      round(score * lit(1000000)).cast("long").as("sq"),
      when(target, 1L).otherwise(0L).as("y"))
    val indexed = Positional.withRowIndex(
      base, Seq(col("sq").desc, col("id")), "__i")
    val n = base.count()
    val overall = base.agg(sum(col("y")).as("resp_total"))
    val dec = indexed
      .withColumn("decile", expr(s"__i * 10 div $n") + 1)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("responders"))
      .crossJoin(broadcast(overall))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("decile"))
      .rowsBetween(Long.MinValue, 0)
    // cumulative over the 10-row decile frame
    dec
      .withColumn("cum_resp", sum(col("responders")).over(w))
      .select(col("decile"), col("n"), col("responders"),
        round(col("responders").cast("double") / col("n"), 6)
          .as("response_rate"),
        round(col("responders").cast("double") / col("n") /
          (col("resp_total").cast("double") / lit(n.toDouble)), 4).as("lift"),
        round(col("cum_resp").cast("double") / col("resp_total"), 6)
          .as("cum_capture"))
      .orderBy(col("decile"))
  }

  /** Average precision (the area under the precision-recall curve in the
    * step-function convention — the AUC companion for imbalanced
    * targets, where ROC-AUC flatters the majority class):
    * `AP = Σ_b (ΔR_b) · P_b` over distinct-score threshold blocks b in
    * DESCENDING score order, with `ΔR_b = pos_b / P` and
    * `P_b = cumpos_b / cum_b` — the threshold-block (not per-row)
    * formulation, so tie order inside a block cannot change the result.
    *
    * Exactness: scores quantize to 6-dp longs (blocks are identical on
    * any engine); `pos/cum` counts are exact integers off one hash
    * aggregate over the distinct-score frame; each block term
    * `pos_b·cumpos_b / (P·cum_b)` is one pinned double expression
    * 12-dp-quantized to a long, so the final sum is order-invariant.
    *
    * Scale shape: one corpus-scan aggregate to the distinct-score frame;
    * the running `cum*` window sorts |distinct scores| rows — the
    * [[graft.analyze.RankStats]] contract (the distinct-value frame, not
    * the corpus, bounds the window). Output: one row
    * `(n, n_pos, avg_precision)`. */
  def averagePrecision(df: DataFrame, score: Column, target: Column): DataFrame = {
    val blocks = df
      .select(round(score * lit(1000000)).cast("long").as("sq"),
        when(target, 1L).otherwise(0L).as("y"))
      .groupBy(col("sq"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sq").desc).rowsBetween(Long.MinValue, 0)
    val cum = blocks
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cumpos", sum(col("pos")).over(w))
    // P (positive total) decorates every block via an unpartitioned
    // window over the block frame — already bounded by |distinct scores|
    val withP = cum.withColumn("p_total",
      sum(col("pos")).over(org.apache.spark.sql.expressions.Window
        .partitionBy()))
    withP.agg(
        sum(col("cnt")).as("n"), sum(col("pos")).as("np"),
        max(col("p_total")).as("p_total"),
        // pos = 0 blocks contribute nothing — guarding them also keeps
        // the all-negative corpus away from 0/0 (NaN here, NULL in
        // engines that null out float division by zero)
        sum(when(col("pos") > 0,
          round(col("pos").cast("double") * col("cumpos").cast("double") /
            (col("p_total").cast("double") * col("cum").cast("double"))
            * lit(1e12)).cast("long")).otherwise(0L)).as("ap_pico"))
      .select(col("n"), col("np").as("n_pos"),
        round(when(col("p_total") > 0,
          col("ap_pico").cast("double") / 1e12), 6).as("avg_precision"))
  }

  /** Murphy decomposition of the Brier score over 10 equal-width score
    * bins — [[calibrationReport]] shows the reliability CURVE; this
    * splits the headline number into its three causes:
    * `REL = Σ n_k(p̄_k−ō_k)²/N` (calibration error — bad),
    * `RES = Σ n_k(ō_k−ō)²/N` (discrimination — good),
    * `UNC = ō(1−ō)` (task difficulty — fixed). One row:
    * `(n, brier, reliability, resolution, uncertainty)` at 6 dp.
    * With binned forecasts the identity `brier = REL − RES + UNC` holds
    * up to the within-bin forecast variance (reported implicitly by the
    * residual); all inputs are exact 6-dp-quantized integer sums. */
  def brierDecomposition(df: DataFrame, score: Column,
                         target: Column): DataFrame = {
    val sq = round(score * lit(1000000)).cast("long")
    val y = when(target, 1L).otherwise(0L)
    val base = df.select(sq.as("sq"), y.as("y"))
      .withColumn("bin", least(floor(col("sq") / 100000L), lit(9L)))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val bins = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_k"), sum(d19(col("sq"))).as("sp"),
        sum(col("y")).as("sy"),
        sum((d19(col("sq")) - d19(col("y")) * 1000000) *
          (d19(col("sq")) - d19(col("y")) * 1000000)).as("e2"))
    // per-bin (p̄−ō)² and ō contributions pinned to 12-dp longs once so
    // the cross-bin sums are exact (≤10 bins, but the contract is free)
    val tot = bins.agg(sum(col("n_k")).as("n"), sum(col("sy")).as("sy"),
      sum(col("e2")).as("e2t"))
    bins.crossJoin(broadcast(tot.select(col("n").as("nt"),
        col("sy").as("syt"))))
      .select(col("n_k"),
        round({
          val pk = col("sp").cast("double") / col("n_k") / 1e6
          val ok = col("sy").cast("double") / col("n_k")
          col("n_k") * (pk - ok) * (pk - ok) * 1e12
        }).cast("decimal(38,0)").as("rel12"),
        round({
          val ok = col("sy").cast("double") / col("n_k")
          val ob = col("syt").cast("double") / col("nt")
          col("n_k") * (ok - ob) * (ok - ob) * 1e12
        }).cast("decimal(38,0)").as("res12"))
      .agg(sum(col("rel12")).as("rel"), sum(col("res12")).as("res"))
      .crossJoin(broadcast(tot))
      .select({
        val n = col("n").cast("double")
        val ob = col("sy").cast("double") / n
        Seq(col("n"),
          round(col("e2t").cast("double") / n / 1e12, 6).as("brier"),
          round(col("rel").cast("double") / n / 1e12, 6).as("reliability"),
          round(col("res").cast("double") / n / 1e12, 6).as("resolution"),
          round(ob * (lit(1.0) - ob), 6).as("uncertainty"))
      }: _*)
  }

  /** Hosmer-Lemeshow goodness-of-fit table over 10 equal-width score
    * bins: per bin the observed vs expected positives/negatives and the
    * χ² contribution `(O₁−E₁)²/E₁ + (O₀−E₀)²/E₀` — the sum across rows
    * is the HL statistic (~χ²(bins−2) under a well-calibrated model).
    * Output per non-empty bin: `(bin, n, obs_pos, exp_pos, obs_neg,
    * exp_neg, contrib)` at 4 dp, ordered by bin. Fixed-width bins (not
    * risk deciles) keep the statistic scale-portable: no global rank
    * pass, one hash aggregate. */
  def hosmerLemeshow(df: DataFrame, score: Column,
                     target: Column): DataFrame = {
    val sq = round(score * lit(1000000)).cast("long")
    val y = when(target, 1L).otherwise(0L)
    def d19(c: Column) = c.cast("decimal(19,0)")
    df.select(sq.as("sq"), y.as("y"))
      .withColumn("bin", least(floor(col("sq") / 100000L), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("obs_pos"),
        sum(d19(col("sq"))).as("ep6"))
      .select(Seq(col("bin"), col("n"), col("obs_pos")) ++ {
        val e1 = col("ep6").cast("double") / 1e6
        val e0 = col("n").cast("double") - e1
        val o1 = col("obs_pos").cast("double")
        val o0 = col("n").cast("double") - o1
        val contrib = when(e1 > 0 && e0 > 0,
          (o1 - e1) * (o1 - e1) / e1 + (o0 - e0) * (o0 - e0) / e0)
        Seq(round(e1, 4).as("exp_pos"),
          (col("n") - col("obs_pos")).as("obs_neg"),
          round(e0, 4).as("exp_neg"), round(contrib, 4).as("contrib"))
      }: _*)
      .select(col("bin"), col("n"), col("obs_pos"), col("exp_pos"),
        col("obs_neg"), col("exp_neg"), col("contrib"))
      .orderBy(col("bin"))
  }
}
