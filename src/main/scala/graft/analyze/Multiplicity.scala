package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** Multiple-testing control: per-group Welch tests + the
  * Benjamini-Hochberg (1995) step-up FDR correction — the guard rail the
  * [[Experiment]] family needs the moment a readout fans out over many
  * segments ("one of 12 segments is p < 0.05" is expected noise, not a
  * discovery; BH bounds the expected FALSE-DISCOVERY share at α).
  *
  * Determinism contract:
  *  - arm membership is the portable md5 unit hash ([[Sharding.hash32]]
  *    mod 2), identical on any engine/rerun;
  *  - per-group moments are exact integer/DECIMAL sums of 6-dp longs;
  *    the Welch z is one double expression over them;
  *  - the two-sided p comes from the Abramowitz-Stegun 26.2.17
  *    polynomial for Φ (coefficients emitted as literals — both engines
  *    run the IDENTICAL double expression; no libm tail-accuracy
  *    divergence can enter), then 12-dp-quantized so the BH threshold
  *    compare `p·m ≤ i·α` is EXACT integer arithmetic;
  *  - the step-up "reject everything up to the LAST passing rank" is a
  *    running max over the rank-ordered frame.
  *
  * Scale shape: ONE corpus-scan aggregate to the per-group moment frame;
  * everything after (p, rank, step-up) lives on the |groups|-bounded
  * frame. */
object Multiplicity {

  private def d19(c: Column): Column = c.cast("decimal(19,0)")

  /** Standard-normal CDF Φ(z) for z ≥ 0 — Abramowitz-Stegun 26.2.17
    * (|ε| < 7.5e-8), as one codegen-able column expression. */
  private def phiPos(z: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    lit(1.0) - exp(-z * z / lit(2.0)) / lit(2.5066282746310002) * poly
  }

  /** Per-group Welch z between the hash arms of `unitCol` on `valueCol`,
    * BH-corrected at `alpha`: `(group, n1, n2, z, p, p_rank, rejected)`.
    * Groups where a variance-zero arm makes z undefined carry NULL p and
    * are never rejected (they also don't count toward m). */
  def welchByGroupBH(df: DataFrame, groupCol: String, unitCol: String,
                     valueCol: String, alpha: Double = 0.05): DataFrame = {
    val vq = round(col(valueCol) * lit(1000000)).cast("long")
    val arm1 = (Sharding.hash32(col(unitCol)) % 2 === 0).cast("long")
    val m = df.select(col(groupCol).as("g"), vq.as("vq"), arm1.as("a1"))
      .groupBy(col("g"))
      .agg(
        sum(col("a1")).as("n1"),
        (count(lit(1)) - sum(col("a1"))).as("n2"),
        sum(when(col("a1") === 1, d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s1"),
        sum(when(col("a1") === 0, d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s2"),
        sum(when(col("a1") === 1, d19(col("vq")) * d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("ss1"),
        sum(when(col("a1") === 0, d19(col("vq")) * d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("ss2"))
    val scored = m.select({
      val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
      val v1 = when(col("n1") > 1,
        (col("ss1").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / n1) /
          (n1 - 1))
      val v2 = when(col("n2") > 1,
        (col("ss2").cast("double") -
          col("s2").cast("double") * col("s2").cast("double") / n2) /
          (n2 - 1))
      val se2 = v1 / n1 + v2 / n2
      val z = when(se2 > 0,
        (col("s1").cast("double") / n1 - col("s2").cast("double") / n2) /
          sqrt(se2))
      val p = lit(2.0) * (lit(1.0) - phiPos(abs(z)))
      Seq(col("g"), col("n1"), col("n2"), round(z, 4).as("z"),
        round(p * lit(1e12)).cast("long").as("pq"))
    }: _*)
    // BH step-up on the |groups| frame: rank by (p, group), m = tested
    // count, last passing rank via a running max from the bottom
    val wAll = Window.partitionBy()
    val wRank = Window.orderBy(col("pq").asc_nulls_last, col("g"))
    val ranked = scored
      .withColumn("m_tested", sum(when(col("pq").isNotNull, 1L)
        .otherwise(0L)).over(wAll))
      .withColumn("p_rank", when(col("pq").isNotNull,
        row_number().over(wRank)))
      .withColumn("pass", col("pq").isNotNull &&
        col("pq") * col("m_tested") <=
          col("p_rank") * lit(math.round(alpha * 1e12)))
    val lastPass = ranked
      .withColumn("k", max(when(col("pass"), col("p_rank"))).over(wAll))
    lastPass.select(col("g").as(groupCol), col("n1"), col("n2"), col("z"),
        round(col("pq").cast("double") / 1e12, 6).as("p"),
        col("p_rank").cast("long").as("p_rank"),
        (col("p_rank").isNotNull && col("k").isNotNull &&
          col("p_rank") <= col("k")).cast("long").as("rejected"))
      .orderBy(col(groupCol))
  }
}
