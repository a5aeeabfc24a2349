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
}
