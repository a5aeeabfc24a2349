package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution: credit each converting user's first touch and
  * last touch before the conversion to a channel — the assignment layer
  * the funnel ([[Funnel]]) and experiment ([[Experiment]]) readouts sit
  * next to in a product-analytics stack (reference anchor: the per-class
  * count rollups of `process_logs_v10.py` §counts).
  *
  * Determinism contract: "first"/"last" are pinned by the total order
  * `(ts, tieCol)` — timestamp ties cannot flip credit between engines.
  * Conversion time is the user's FIRST conversion event; touches at or
  * after it earn nothing (post-conversion activity is not attributable).
  *
  * Scale shape: one user-keyed window sort over the pre-conversion touch
  * stream (rank from both ends in the SAME window pass — no second
  * shuffle), then a channel-keyed rollup of |channels| rows. The
  * conversion-time frame is a per-user aggregate joined back on the user
  * key, which AQE broadcast-converts when the converter set is small.
  */
object Attribution {

  /** Per-channel `(channel, first_touch, last_touch)` conversion credit.
    * `convFilter` marks conversion events; all other event types are
    * touches carrying their `channelCol` value. */
  def touchReport(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, channelCol: String,
                  convFilter: Column): DataFrame = {
    val conv = events.filter(convFilter)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("conv_ts"))
    val touches = events.filter(!convFilter)
      .join(conv, userCol)
      .filter(col(tsCol) < col("conv_ts"))
    val w = Window.partitionBy(col(userCol))
    val ranked = touches.select(
      col(userCol), col(channelCol).as("channel"),
      row_number().over(w.orderBy(col(tsCol), col(tieCol))).as("rn_a"),
      row_number().over(w.orderBy(col(tsCol).desc, col(tieCol).desc)).as("rn_d"))
    ranked.filter(col("rn_a") === 1 || col("rn_d") === 1)
      .groupBy(col("channel"))
      .agg(
        sum(when(col("rn_a") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("rn_d") === 1, 1L).otherwise(0L)).as("last_touch"))
      .orderBy(col("channel"))
  }

  /** EXACT Shapley-value attribution over three channels (Shapley 1953
    * applied to conversion credit — the fairness-axiomatic split that
    * first/last/linear touch ([[touchReport]]) approximate): credit for
    * channel i is the average marginal contribution
    * `Σ_T |T|!(2−|T|)!/3! · (v(T∪i) − v(T))` over coalitions T of the
    * other channels, with the characteristic function
    * `v(T)` = converted users whose touched channel set ⊆ T.
    *
    * Three channels keep the 2³ coalition enumeration LITERAL — exact,
    * no sampling (the >10-channel regime needs permutation sampling and
    * belongs to a different operator). Efficiency axiom holds by
    * construction: Σ shapley = v(all) − v(∅), pinned in the spec.
    *
    * Scale shape: one user-keyed aggregate (touched flags + converted),
    * one 8-cell conditional rollup, then literal arithmetic on a single
    * row. Exactness: v values are exact integer counts; each Shapley
    * value is one pinned rational-over-integer double, 6 dp. */
  def shapley3(events: DataFrame, userCol: String,
               chA: Column, chB: Column, chC: Column,
               converted: Column): DataFrame = {
    val users = events.groupBy(col(userCol).as("u"))
      .agg(max(when(chA, 1L).otherwise(0L)).as("a"),
        max(when(chB, 1L).otherwise(0L)).as("b"),
        max(when(chC, 1L).otherwise(0L)).as("c"),
        max(when(converted, 1L).otherwise(0L)).as("conv"))
      .filter(col("conv") === 1)
    // exact-set cells: count converted users whose touched set is
    // EXACTLY (a, b, c) — v(T) = Σ over cells ⊆ T
    def cell(a: Int, bb: Int, cc: Int) =
      sum(when(col("a") === a && col("b") === bb && col("c") === cc, 1L)
        .otherwise(0L)).as(s"n$a$bb$cc")
    val cells = users.agg(cell(0, 0, 0), cell(1, 0, 0), cell(0, 1, 0),
      cell(0, 0, 1), cell(1, 1, 0), cell(1, 0, 1), cell(0, 1, 1),
      cell(1, 1, 1))
    val v = cells.select(
      col("n000").as("v0"),
      (col("n000") + col("n100")).as("va"),
      (col("n000") + col("n010")).as("vb"),
      (col("n000") + col("n001")).as("vc"),
      (col("n000") + col("n100") + col("n010") + col("n110")).as("vab"),
      (col("n000") + col("n100") + col("n001") + col("n101")).as("vac"),
      (col("n000") + col("n010") + col("n001") + col("n011")).as("vbc"),
      (col("n000") + col("n100") + col("n010") + col("n001") +
        col("n110") + col("n101") + col("n011") + col("n111")).as("vabc"))
    // weights for |T| = 0/1/2 of the OTHER two channels: 1/3, 1/6, 1/3
    def sh(vI: Column, v0: Column, vIJ: Column, vJ: Column,
           vIK: Column, vK: Column, vAll: Column, vJK: Column) =
      (vI - v0).cast("double") / 3 + (vIJ - vJ).cast("double") / 6 +
        (vIK - vK).cast("double") / 6 + (vAll - vJK).cast("double") / 3
    val spark = events.sparkSession
    import spark.implicits._
    val chans = Seq("A", "B", "C").toDF("channel")
    chans.crossJoin(broadcast(v))
      .select(col("channel"),
        round(when(col("channel") === "A",
            sh(col("va"), col("v0"), col("vab"), col("vb"),
              col("vac"), col("vc"), col("vabc"), col("vbc")))
          .when(col("channel") === "B",
            sh(col("vb"), col("v0"), col("vab"), col("va"),
              col("vbc"), col("vc"), col("vabc"), col("vac")))
          .otherwise(
            sh(col("vc"), col("v0"), col("vac"), col("va"),
              col("vbc"), col("vb"), col("vabc"), col("vab"))), 6)
          .as("shapley"),
        col("vabc").as("n_converted"))
      .orderBy(col("channel"))
  }
}
