package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time disorder audit — the measurement that SIZES a streaming
  * watermark instead of guessing it: per key (arrival order pinned by a
  * tie column), how many events arrive behind the running event-time
  * maximum, how far behind, and the exact p99 of that lateness. A
  * watermark below the reported p99 silently drops ~1% of state updates;
  * the audit turns `withWatermark("1 hour")` from folklore into a
  * measured choice (companion to `streaming.StreamingOps`' windowed
  * aggregations).
  *
  * Exactness: backstep = running-max(prior ts) − ts in integer
  * MICROSECONDS; p99 is the exact lower-rank statistic at
  * `(n+1)·0.99` over the pinned `(backstep, tie)` order — the same
  * no-interpolation discipline as [[RobustStats]]/[[Conformal]].
  *
  * Scale shape: one key-partitioned window (running max) over the
  * corpus, then the disordered SUBSET (usually a sliver) pays one rank
  * window; the report is one row. */
object DisorderAudit {

  /** One row: `(n_events, n_disordered, max_backstep_sec,
    * p99_backstep_sec)` (seconds at 6 dp). */
  def report(events: DataFrame, keyCol: String, tsCol: String,
             tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("tie"))
      .rowsBetween(Long.MinValue, -1)
    val stepped = events.select(col(keyCol).as("k"), col(tieCol).as("tie"),
        unix_micros(col(tsCol)).as("tus"))
      .withColumn("prior_max", max(col("tus")).over(w))
      .withColumn("backstep",
        when(col("prior_max") > col("tus"), col("prior_max") - col("tus"))
          .otherwise(lit(0L)))
    val late = stepped.filter(col("backstep") > 0)
      .select(col("backstep"), col("tie"))
    val wr = Window.orderBy(col("backstep"), col("tie"))
    // rank window over the DISORDERED sliver only, not the corpus
    val p99 = late
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .filter(col("rn") === least(
        ceil((col("n") + 1) * lit(0.99)).cast("long"), col("n")))
      .select(col("backstep").as("p99b"))
    val base = stepped.agg(
      count(lit(1)).as("n_events"),
      sum(when(col("backstep") > 0, 1L).otherwise(0L)).as("n_disordered"),
      round(max(col("backstep")).cast("double") / 1e6, 6)
        .as("max_backstep_sec"))
    base.crossJoin(broadcast(
      p99.agg(round(coalesce(max(col("p99b")), lit(0L)).cast("double") / 1e6, 6)
        .as("p99_backstep_sec"))))
  }
}
