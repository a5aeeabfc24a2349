package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark has no single primitive for, composed from
  * built-ins (preference (a) of the custom-operator ladder — no custom
  * plan node needed, Catalyst keeps optimizing through them).
  *
  * Both are per-key window pipelines: ONE hash shuffle on the key, then
  * sorted within partitions — no global sort, no driver state, skew
  * bounded by the hottest key.
  */
object Temporal {

  /** Time-series GAP FILL with forward fill (metrics resampling): bucket
    * each key's events into fixed windows, build the key's complete
    * bucket spine from its first to its last observation, and carry the
    * last observed value across empty buckets — the
    * "resample-then-ffill" step every metrics/feature pipeline runs
    * before joining series with different cadences.
    *
    * Per bucket the value is the LATEST event's (`(ts, tie)` order, so
    * same-bucket races are deterministic). Output: `(keyCol, bucket,
    * value, observed)` — `observed` false on filled rows; leading gaps
    * cannot exist (the spine starts at the key's first observation).
    *
    * Scale shape: one key-hash shuffle for the per-bucket max-struct
    * aggregate; the spine is a per-key `sequence()` explode (bounded by
    * the key's own time range — never a global calendar cross join);
    * the forward fill is a `last(ignoreNulls)` running window on the
    * same key partitioning. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              tieCol: String, valCol: String, bucketSeconds: Long): DataFrame = {
    val bucketMicros = bucketSeconds * 1000000L
    // integer `div`, never `/`: micros exceed 2^53 (see Tables loader)
    val bucket = timestamp_micros(
      expr(s"unix_micros($tsCol) div ${bucketMicros}L") * bucketMicros)
    // latest observation per (key, bucket): ties pinned by (ts, tie)
    // `__seen` marks the BUCKET having any event — distinct from the
    // latest value being non-null, so a null-valued metric observation
    // still reports observed=true (its value forward-fills past it)
    val observed = events
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(max(struct(col(tsCol), col(tieCol), col(valCol).as("v"))).as("__last"))
      .select(col(keyCol), col("bucket"), col("__last.v").as("__obs"),
        lit(true).as("__seen"))
    val spine = observed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $bucketSeconds SECONDS"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq(keyCol, "bucket"), "left_outer")
      .select(col(keyCol), col("bucket"),
        last(col("__obs"), ignoreNulls = true).over(w).as("value"),
        coalesce(col("__seen"), lit(false)).as("observed"))
  }

  /** Per-key ROLLING time-range aggregates: for every event, the count
    * and value-sum of the key's events inside the trailing
    * `[t − windowSeconds, t]` interval (both ends inclusive — the
    * standard RANGE INTERVAL PRECEDING frame). The per-row trailing
    * window no tumbling/hopping bucket can express: rate limiting,
    * rolling engagement, burst detection.
    *
    * Frame bounds run on `unix_micros` (same sub-second-exact contract
    * as [[sessionize]]): Spark's RANGE frame needs a single numeric
    * ordering column, and micros are exactly what the oracle's
    * `RANGE BETWEEN INTERVAL ... PRECEDING` resolves to. One hash
    * shuffle on the key; within a partition the running frame is the
    * two-pointer walk WindowExec already implements — no self-join, no
    * per-row rescan. Sum via the exact long split
    * ([[graft.operators.ExactAgg]]): order-invariant under any
    * partitioning, on the codegen'd long path, rounded at 4 dp with the
    * engine-portable scale-0 round. */
  def rollingAgg(events: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    events
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window", ExactAgg.dsumOver(col(valCol), w, 4))
  }

  /** Rolling Z-SCORE ANOMALY DETECTION: flag every event whose value
    * deviates more than `zThreshold` sample standard deviations from the
    * mean of the key's OWN trailing `[t − windowSeconds, t)` interval —
    * the self-referential burst/outlier detector behind metric alerting
    * (a global threshold can't serve keys with different baselines).
    * The frame EXCLUDES the current row: an event must be judged against
    * the history before it, or a large outlier drags its own baseline
    * toward itself (masking) and the first event of a key trivially has
    * z = 0.
    *
    * Variance from EXACT-LONG-SPLIT power sums
    * ([[graft.operators.ExactAgg]]: `Σx`, `Σx²` identical at any
    * partitioning, `var = (Σx² − (Σx)²/n)/(n−1)`) — the engine-portable
    * form: a windowed `stddev_samp` accumulates doubles in frame order
    * and two engines disagree in the last ulp. Frames with n < 2 or
    * zero variance yield no anomaly (no z is defined).
    *
    * Scale shape: one key-hash shuffle for the window ([[rollingAgg]]'s
    * frame contract — micros ordering, two-pointer RANGE walk inside
    * WindowExec); the z computation and threshold filter are map-side
    * projections of the frame sums. */
  def rollingZscoreAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                             valCol: String, windowSeconds: Long,
                             zThreshold: Double): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, -1L)
    val n = count(col(valCol)).over(w)
    val s1 = ExactAgg.dsumUnroundedOver(col(valCol), w)
    val s2 = ExactAgg.dsumUnroundedOver(col(valCol) * col(valCol), w)
    val mean = s1 / n
    // n > 1 guard INSIDE the expression (the Outliers discipline): an
    // n = 1 frame would divide by zero — IEEE-Inf on Spark doubles, but
    // engine-setting-dependent elsewhere; the guard makes the contract
    // explicit instead of leaning on Inf comparing un-anomalous
    val variance = when(n > 1, (s2 - s1 * s1 / n) / (n - 1))
    events
      .withColumn("__n", n)
      .withColumn("__mean", mean)
      .withColumn("__var", variance)
      .filter(col("__n") >= 2 && col("__var") > 0)
      .withColumn("z", (col(valCol) - col("__mean")) / sqrt(col("__var")))
      .filter(abs(col("z")) >= zThreshold)
      .select(col(keyCol), unix_micros(col(tsCol)).as("ts_us"),
        col(valCol), round(col("z"), 4).as("z"))
  }

  /** Gap-based sessionization: a new session starts when the gap since the
    * key's previous event exceeds `gapSeconds`. Adds `session_id`
    * (0-based per key, by time order).
    *
    * Gaps are measured in MICROSECONDS (`unix_micros`), not
    * `unix_timestamp`: second-truncation would make a true 1800.4 s gap
    * read as 1800 and disagree with any engine that keeps sub-second
    * precision (the oracle's `epoch_us`) exactly at the boundary. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val gap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w))
    val gapMicros = gapSeconds * 1000000L
    events
      .withColumn("__new_session", when(gap.isNull || gap > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__new_session")
  }

  /** Per-key ordered SEQUENCE ASSEMBLY: collapse each key's rows into one
    * row carrying the payload sequence in `order`-sorted order — the
    * conversation/trajectory-building step of a training-data pipeline
    * (events → per-user interaction sequence, turns → dialogue).
    *
    * `collect_list` gives no ordering guarantee under parallel
    * aggregation, so the struct is sorted AFTER collection:
    * `array_sort(collect_list(struct(order..., payload)))` — struct
    * comparison is lexicographic by field position, so the leading
    * `order` columns (which must form a total order per key for a
    * deterministic result) pin the sequence regardless of partitioning.
    * One hash shuffle on the key; the aggregation buffer holds one key's
    * rows, so per-key cardinality must be application-bounded
    * (conversations are; for unbounded keys window/pack first —
    * [[graft.operators.Packing]]). */
  def assembleSequences(df: DataFrame, keyCol: String, order: Seq[Column],
                        payload: Column): DataFrame = {
    val sorted = array_sort(collect_list(struct(order :+ payload.as("__p"): _*)))
    df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_turns"),
      concat_ws(",", transform(sorted, x => x("__p"))).as("seq"))
  }

  /** As-of join: for every left row, the most recent right row of the same
    * key with `right.ts <= left.ts`. Implemented with the union trick —
    * tag both inputs, sort per key by (ts, tag) with right rows first at
    * equal timestamps, and carry the last non-null right value forward
    * (`last(..., ignoreNulls = true)` over an unbounded-preceding frame).
    * One shuffle on the key; never a range join or per-row probe. */
  /** As-of join with a staleness bound (pandas `merge_asof(tolerance=…)`
    * semantics): matches older than `toleranceSeconds` before the left
    * row are nulled out. Same single-shuffle union-trick plan as
    * [[asOfJoin]] — the match timestamp is carried alongside the value
    * and the bound applied as a projection. `tsCol` must be a TIMESTAMP
    * (the bound is measured in microseconds). */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                        leftValCol: String, rightValCol: String,
                        toleranceSeconds: Long): DataFrame = {
    val joined = asOfJoinWithTs(left, right, keyCol, tsCol, leftValCol, rightValCol)
    val fresh = unix_micros(col(tsCol)) - unix_micros(col("__asof_ts")) <=
      toleranceSeconds * 1000000L
    joined
      .withColumn(s"asof_$rightValCol",
        when(col("__asof_ts").isNotNull && fresh, col(s"asof_$rightValCol")))
      .drop("__asof_ts")
  }

  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               leftValCol: String, rightValCol: String): DataFrame =
    asOfJoinWithTs(left, right, keyCol, tsCol, leftValCol, rightValCol)
      .drop("__asof_ts")

  private def asOfJoinWithTs(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                             leftValCol: String, rightValCol: String): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(leftValCol).as("lv"), lit(null).cast(right.schema(rightValCol).dataType).as("rv"),
      lit(1).as("side"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("t"),
      lit(null).cast(left.schema(leftValCol).dataType).as("lv"),
      col(rightValCol).as("rv"), lit(0).as("side"))
    // third sort key makes ties among same-timestamp right rows
    // deterministic (explicit null placement — engine defaults differ)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionAll(r)
      // match timestamp rides only on rows that carry a match VALUE, so
      // last(rv) and last(__rt) always come from the same row
      .withColumn("__rt", when(col("side") === 0 && col("rv").isNotNull, col("t")))
      .withColumn("asof", last(col("rv"), ignoreNulls = true).over(w))
      .withColumn("__asof_ts", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("k").as(keyCol), col("t").as(tsCol),
        col("lv").as(leftValCol), col("asof").as(s"asof_$rightValCol"),
        col("__asof_ts"))
  }
}
