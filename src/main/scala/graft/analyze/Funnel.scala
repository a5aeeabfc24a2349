package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel analysis: how many users complete step 1, then
  * step 2 STRICTLY AFTER their first step-1 event, then step 3 after
  * that, … — the conversion query behind every product-analytics
  * dashboard (reference: the event-count / per-class aggregation family,
  * `process_logs_v10.py` §counts, generalized to ordered sequences).
  *
  * Semantics: a user reaches step k at time `t_k = min{ts : event =
  * step_k, ts > t_{k-1}}` (strict inequality — simultaneous events do
  * not chain). Users reaching step k are exactly those with a defined
  * `t_k`; conversion is `|step k| / |step k−1|`.
  *
  * Scale shape: one pass per step — step 1 is a plain min-aggregate on
  * the filtered event type; each later step filters the event scan to
  * its own type and joins the (user, t_{k-1}) frame on the user key
  * before re-aggregating. All joins and aggregates share the user-id
  * hash partitioning, so after the first shuffle each subsequent stage
  * reuses co-location (Exchange reuse); the per-step frames carry
  * `(user, timestamp)` only — 16 bytes per reaching user, never event
  * payloads. The funnel depth is a query constant (3–6 steps), so the
  * linear pass count is bounded; per-step user sets only shrink.
  */
object Funnel {

  /** Per-step funnel counts: `(step_idx, step, n_users, conversion)`
    * where conversion is `n_users / previous step n_users` rounded to
    * 4 dp (null for the first step). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    // t_k per user, built step over step; each frame is (u, tk)
    val reached = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = base.filter(col("et") === step)
        val timed = prev match {
          case None => mine
          case Some(p) => mine.join(p, Seq("u")).filter(col("t") > col("tk"))
            .select(col("u"), col("et"), col("t"))
        }
        Some(timed.groupBy(col("u")).agg(min(col("t")).as("tk")))
    }.flatten
    // counts are one row per step: a union of tiny aggregates, ordered by
    // step index; conversion via a lag window over the step order (the
    // frame is funnel-depth-sized — the single partition is 3-6 rows)
    val counts = reached.zip(steps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).cast("long").as("step_idx"), lit(step).as("step"),
            col("n_users"))
    }.reduce(_.unionAll(_))
    val w = Window.orderBy(col("step_idx"))
    // a zero-user previous step makes conversion explicitly NULL (not
    // the engine-dependent 0/0 — Spark IEEE NaN vs DuckDB NULL-or-NaN
    // depending on its ieee_floating_point_ops setting)
    val prev = lag(col("n_users"), 1).over(w)
    counts
      .withColumn("conversion",
        round(col("n_users").cast("double") /
          when(prev === 0, lit(null)).otherwise(prev), 4))
      .select(col("step_idx"), col("step"), col("n_users"), col("conversion"))
  }

  /** Time-bounded funnel (the `windowFunnel` of product-analytics SQL
    * engines): step k counts only when the whole chain fits inside
    * `windowSeconds` of the user's FIRST step-1 event. Same strict-order
    * chaining as [[funnel]] (`t_k = min{ts : event = step_k, t_{k-1} <
    * ts ≤ t_1 + W}`), deterministic because the anchor is the unique
    * first step-1 timestamp — a slide-the-anchor variant would need
    * per-occurrence search; anchoring at first entry is the common
    * dashboard semantic and keeps every stage a min-aggregate.
    *
    * Scale shape: identical to [[funnel]] — one user-keyed min-aggregate
    * per step, all sharing the user-hash partitioning; the deadline rides
    * the per-user frame as one extra timestamp column. */
  def windowFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    val first = base.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("tk"))
      .withColumn("deadline",
        timestamp_micros(unix_micros(col("tk")) + windowSeconds * 1000000L))
    val reached = steps.tail.scanLeft(first) { (p, step) =>
      base.filter(col("et") === step).join(p, Seq("u"))
        .filter(col("t") > col("tk") && col("t") <= col("deadline"))
        .groupBy(col("u"), col("deadline")).agg(min(col("t")).as("tk"))
    }
    val counts = reached.zip(steps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).cast("long").as("step_idx"), lit(step).as("step"),
            col("n_users"))
    }.reduce(_.unionAll(_))
    val w = Window.orderBy(col("step_idx"))
    val prev = lag(col("n_users"), 1).over(w)
    counts
      .withColumn("conversion",
        round(col("n_users").cast("double") /
          when(prev === 0, lit(null)).otherwise(prev), 4))
      .select(col("step_idx"), col("step"), col("n_users"), col("conversion"))
  }

  /** First-order Markov TRANSITION MATRIX over event types: for every
    * consecutive event pair of a user (ordered by `(ts, tie)`, gap ≤
    * `maxGapSeconds` — longer gaps are journey breaks, not
    * transitions), count `from → to` and estimate `P(to | from)` — the
    * user-journey / next-action model behind flow diagrams and funnel
    * discovery.
    *
    * Scale shape: one user-hash shuffle for the lag window (the same
    * partitioning [[funnel]] and [[graft.operators.Temporal.sessionize]]
    * use), then a map-side-combined count over the (from, to) pairs —
    * the matrix is |event types|² rows no matter the corpus. The
    * probability normalization is a window over that tiny matrix.
    * Deterministic: the `(ts, tieCol)` compound order pins same-instant
    * events. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String,
                       maxGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val paired = events
      .withColumn("__pt", lag(col(typeCol), 1).over(w))
      .withColumn("__gap", unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
      .filter(col("__pt").isNotNull && col("__gap") <= maxGapSeconds * 1000000L)
    val counts = paired.groupBy(col("__pt").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts
      .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(byFrom), 4))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  /** Conditional next-event entropy of the first-order transition chain
    * (nats): per-state `H(next | state)` plus the chain-level
    * `H(next | cur) = Σ p(s)·H(next|s)` — LOW means navigation is
    * predictable (template traffic), HIGH means exploratory; the
    * one-number summary of [[transitionMatrix]]'s |types|² rows.
    *
    * Determinism: the `x·ln x` identity on exact transition counts
    * (`n_s·H_s = ln-sum form`), per-term 6-dp quantized before the
    * state-bounded sums — the [[Contingency.infoGain]] contract. Scale:
    * everything after the lag window is |types|-bounded. */
  def transitionEntropy(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, tieCol: String,
                        maxGapSeconds: Long): DataFrame = {
    def xlnx(c: Column): Column =
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(0.0)
    val counts = transitionMatrix(events, userCol, typeCol, tsCol, tieCol,
      maxGapSeconds).select(col("from_type"), col("n"))
    val byFrom = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("ns"),
        sum(round(xlnx(col("n")) * lit(1e6)).cast("long")).as("__sxl6"))
      .select(col("from_type"), col("ns"),
        round((xlnx(col("ns")) - col("__sxl6").cast("double") / 1e6) /
          col("ns").cast("double"), 6).as("h_next"))
    val total = byFrom.agg(
        sum(col("ns")).as("__n"),
        sum(round(col("h_next") * col("ns").cast("double") * lit(1e6))
          .cast("long")).as("__h6"))
      .select(round(col("__h6").cast("double") / 1e6 /
        col("__n").cast("double"), 6).as("h_cond"))
    byFrom.join(broadcast(total))
      .select(col("from_type"), col("ns").as("n"), col("h_next"),
        col("h_cond"))
      .orderBy(col("from_type"))
  }

  /** Time-to-convert distribution for a funnel: per-user elapsed seconds
    * from the FIRST step-1 completion to the funnel's full completion
    * (strict-ordering chain, same semantics as [[funnel]]), summarized
    * as exact percentiles. Output: one row — `(n_converted, p50_s,
    * p90_s)` with linear-interpolation percentiles over the per-user
    * durations (the q42 `percentile`/`quantile_cont` contract).
    *
    * Scale shape: the per-step chain is [[funnel]]'s — user-keyed
    * min-aggregates sharing one hash partitioning; the percentile
    * aggregate sees ONE duration per converted user (a corpus-scale
    * reduction has already happened), and exact percentile state is
    * bounded by the converted-user count per group — swap in the sketch
    * quantiles of [[graft.operators.Sketches]] when even that is too
    * wide. */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "time-to-convert needs at least two steps")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    val first = base.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("t0"))
    val last = steps.tail.foldLeft(first.withColumn("tk", col("t0"))) { (p, step) =>
      base.filter(col("et") === step).join(p, Seq("u"))
        .filter(col("t") > col("tk"))
        .groupBy(col("u"), col("t0")).agg(min(col("t")).as("tk"))
    }
    last
      .select(((unix_micros(col("tk")) - unix_micros(col("t0"))) / 1e6).as("dt"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(dt, 0.5)"), 3).as("p50_s"),
        round(expr("percentile(dt, 0.9)"), 3).as("p90_s"))
  }

  /** Weekly cohort retention: users bucketed by the week of their FIRST
    * event (week = days-since-`epochDate` div 7 — portable integer
    * arithmetic, no engine-specific week-truncation rules), counted as
    * retained in every later week they produce any event.
    *
    * Output: `(cohort_week, offset_weeks, n_users)` — n_users distinct
    * users of cohort `cohort_week` active `offset_weeks` weeks after
    * their first event (offset 0 = the cohort size itself).
    *
    * Scale shape: the (user, week) activity grid is a distinct over the
    * event scan (map-side combined); the cohort assignment is a
    * user-keyed min-aggregate joined back on the same user hash
    * partitioning; the final rollup groups a frame that is at most
    * |users| × |weeks| rows of three integers. */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String,
                      epochDate: String): DataFrame = {
    // FLOOR division, not cast-truncation: days −6..−1 before the epoch
    // date belong to week −1 (DuckDB's `// 7`), while a long cast would
    // truncate them toward zero into week 0
    val weeks = events.select(col(userCol).as("u"),
        floor(datediff(to_date(col(tsCol)), to_date(lit(epochDate))) / lit(7))
          .cast("long").as("wk"))
      .distinct()
    val cohort = weeks.groupBy(col("u")).agg(min(col("wk")).as("cohort_week"))
    weeks.join(cohort, Seq("u"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("offset_weeks"))
      .agg(count(lit(1)).as("n_users"))
  }
}
