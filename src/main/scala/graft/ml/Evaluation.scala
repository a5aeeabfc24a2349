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
}
