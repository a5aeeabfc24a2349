package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-breakpoint changepoint detection on keyed daily series — the
  * "when did this metric change regime" readout that closes the trend
  * family ([[Trend]] asks "is it drifting", the rolling z-score asks "is
  * this point weird", this asks WHEN the level shifted): piecewise-
  * constant least squares, breakpoint = the split minimizing total SSE
  * (the classic CUSUM-equivalent formulation, Page 1954 / Hinkley 1970).
  *
  * Determinism: daily totals are exact 6-dp longs; each candidate
  * split's SSE is the two-segment variance identity
  * `Σy² − (Σy)²/n` computed in double FROM EXACT integer prefix sums —
  * identical inputs, identical IEEE ops on every engine; argmin ties
  * break on the earlier day via a struct-min total order.
  *
  * Scale shape: the corpus folds to (key, day) once; prefix sums,
  * the candidate scan and the argmin all run on the days×keys frame
  * (window per key over ≤ study-span rows). Candidates are evaluated
  * with O(T) prefix arithmetic — never an O(T²) self-join. */
object Changepoint {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")

  /** Multi-breakpoint detection by GLOBAL-GREEDY binary segmentation
    * (the textbook iterated form of Scott & Knott 1974): up to
    * `maxBreaks` rounds, each splitting THE current segment (per key)
    * whose best split buys the largest absolute SSE reduction, gated on
    * a fractional `minGain` of that segment's own SSE. Unlike the
    * earlier depth-first budget recursion, each round's state is a pure
    * function of the break set — which makes the whole procedure an
    * unrollable SQL twin (the q139/q288 fixpoint argument does not even
    * apply: the round count is the literal budget).
    *
    * Determinism: daily totals are exact 6-dp longs; every SSE is the
    * two-segment variance identity in double FROM EXACT integer prefix
    * sums; argmins break ties on the earlier split index, the round's
    * cross-segment argmax on (reduction desc, segment start asc) — a
    * total order both engines share bit-for-bit.
    *
    * Scale shape: the corpus folds to the days×keys frame once; the
    * greedy rounds run driver-local over that bounded frame. Returns
    * `(key, break_day)` rows, ordered. */
  def binarySegmentation(df: DataFrame, keyCol: String, tsCol: String,
                         valueCol: String, maxBreaks: Int,
                         minGain: Double = 0.05): DataFrame = {
    require(maxBreaks >= 1 && maxBreaks <= 16, s"maxBreaks: $maxBreaks")
    val spark = df.sparkSession
    import spark.implicits._
    val daily = df.groupBy(col(keyCol).cast("string").as("k"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("y6"))
      .localCheckpoint(true)
    val series = daily.as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1)
    // SSE of days [lo, hi) from exact integer prefix sums — one double
    // expression, identical on any engine
    def sseOf(ps: Array[Long], pss: Array[BigInt], lo: Int, hi: Int): Double = {
      val n = hi - lo
      if (n <= 0) 0.0
      else {
        val s = (ps(hi) - ps(lo)).toDouble / 1e6
        val ss = (pss(hi) - pss(lo)).toDouble / 1e12
        ss - s * s / n
      }
    }
    series.toSeq.sortBy(_._1).flatMap { case (k, rows) =>
      val days = rows.sortBy(_._2.getTime).map(r => (r._2, r._3)).toArray
      val n = days.length
      val ps = new Array[Long](n + 1)
      val pss = new Array[BigInt](n + 1)
      pss(0) = BigInt(0)
      for (i <- 0 until n) {
        ps(i + 1) = ps(i) + days(i)._2
        pss(i + 1) = pss(i) + BigInt(days(i)._2) * BigInt(days(i)._2)
      }
      var bounds = List(0, n) // segment boundaries, sorted
      var rounds = 0
      var go = n >= 2
      while (go && rounds < maxBreaks) {
        // per segment: the best split by (sse asc, t asc); across
        // segments: the best by (reduction desc, lo asc), gated on the
        // fractional gain
        var pick = -1; var pickRed = 0.0; var pickLo = Int.MaxValue
        bounds.zip(bounds.tail).foreach { case (lo, hi) =>
          if (hi - lo >= 2) {
            val total = sseOf(ps, pss, lo, hi)
            if (total > 0) {
              var best = -1; var bestSse = Double.MaxValue
              var t = lo + 1
              while (t < hi) {
                val s = sseOf(ps, pss, lo, t) + sseOf(ps, pss, t, hi)
                if (s < bestSse) { bestSse = s; best = t }
                t += 1
              }
              val red = total - bestSse
              if (red / total >= minGain &&
                (red > pickRed || (red == pickRed && lo < pickLo))) {
                pick = best; pickRed = red; pickLo = lo
              }
            }
          }
        }
        if (pick < 0) go = false
        else { bounds = (pick :: bounds).sorted; rounds += 1 }
      }
      bounds.filter(b => b > 0 && b < n).sorted.map(b => (k, days(b)._1))
    }.toDF(keyCol, "break_day")
      .orderBy(col(keyCol), col("break_day"))
  }

  /** Per key: `(key, break_day, mean_before, mean_after, sse)` — the
    * breakpoint is the FIRST day of the second segment. Keys with < 2
    * days report no row. */
  /** One-sided CUSUM mean-shift monitor over the DAILY SUM of `valueCol`
    * per group (Page 1954): `S_t = max(0, S_{t−1} + (x_t − μ − kσ))`,
    * alarm when S crosses `hσ`. The RECURSION is eliminated with the
    * Kadane prefix-sum identity — `S_t = P_t − min(0, min_{i≤t−1} P_i)`
    * where `P` is the running sum of the slack-adjusted series — so the
    * whole monitor is two per-group WINDOW passes (cumsum, running min),
    * never a sequential loop: the q197/q202 changepoint family's online
    * sibling, fully distributed.
    *
    * Output `(group, n_days, s_max, alarm_day)`: the peak CUSUM (in σ
    * units, 4 dp) and the FIRST day the statistic crossed `h`·σ (null =
    * never). Determinism: daily sums are 6-dp-quantized longs; μ/σ come
    * from exact integer moments; the slack-adjusted increments are
    * re-quantized to longs so every prefix sum and min is exact integer
    * arithmetic — both engines compare identical longs. */
  def cusum(df: DataFrame, groupCol: String, tsCol: String,
            valueCol: String, k: Double = 0.5, h: Double = 4.0): DataFrame = {
    val daily = df.groupBy(col(groupCol).as("g"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("q"))
    val moments = daily.groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("q"))).as("__s"),
        sum(dec(col("q")) * dec(col("q"))).as("__ss"))
      .select(col("g"), col("n_days"), {
        val n = col("n_days").cast("double")
        (col("__s").cast("double") / n).as("__mu")
      }, {
        val n = col("n_days").cast("double")
        val mu = col("__s").cast("double") / n
        sqrt(greatest(col("__ss").cast("double") / n - mu * mu, lit(0.0)))
          .as("__sigma")
      })
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val scored = daily
      .join(broadcast(moments), Seq("g"))
      // slack-adjusted increment, re-quantized: exact longs from here on
      .withColumn("__y",
        round(col("q").cast("double") - col("__mu") - lit(k) * col("__sigma"))
          .cast("long"))
      .withColumn("__p", sum(col("__y")).over(w))
      .withColumn("__s_t", col("__p") -
        least(lit(0L), coalesce(min(col("__p")).over(wPrev), lit(0L))))
      // threshold in the same quantized unit
      .withColumn("__h", round(lit(h) * col("__sigma")).cast("long"))
    scored.groupBy(col("g"), col("n_days"), col("__sigma"))
      .agg(max(col("__s_t")).as("__smax"),
        min(when(col("__s_t") >= col("__h") && col("__h") > 0, col("day")))
          .as("alarm_day"))
      .select(col("g").as(groupCol), col("n_days"),
        round(when(col("__sigma") > 0,
          col("__smax").cast("double") / col("__sigma")), 4).as("s_max"),
        col("alarm_day"))
      .orderBy(col(groupCol))
  }

  /** Pettitt changepoint test (Pettitt 1979): the RANK-based single
    * break detector — `U_t = 2·S_t − t(N+1)` over average ranks of the
    * daily totals, `K = max|U_t|`, break at the earliest argmax, with
    * the standard approximation `p ≈ min(1, 2·exp(−6K²/(N³+N²)))`. The
    * nonparametric sibling of [[singleBreak]]/[[cusum]]: a level shift
    * is found without assuming normal residuals, and one wild day can't
    * fake one.
    *
    * Exactness: doubled average ranks off the distinct-daily-value fold
    * make S₂ₜ = Σr₂ and U_t = S₂ₜ/1 − t(N+1) pure integers (the r₂
    * doubling cancels against 2·S_t); K, the argmax day and the tie
    * rule (earliest) are integer comparisons. Scale: one corpus
    * day-fold; ranks/cumulatives run on days-bounded frames. One row:
    * `(n_days, k_stat, break_day, p_approx)`. */
  def pettitt(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("yq"))
    val byV = daily.groupBy(col("yq")).agg(count(lit(1)).as("ct"))
    val wv = Window.orderBy(col("yq")).rowsBetween(Long.MinValue, -1)
    val rk = byV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(wv), lit(0L)) + col("ct") + 1)
    val wd = Window.orderBy(col("day"))
    val u = daily.join(rk.select(col("yq"), col("r2")), "yq")
      .withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("s2", sum(col("r2")).over(
        wd.rowsBetween(Long.MinValue, 0)))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("nd"))))
      .select(col("day"), col("nd"),
        (col("s2") - col("t") * (col("nd") + 1)).as("ut"))
    val mx = u.agg(max(abs(col("ut"))).as("k2"))
    u.crossJoin(broadcast(mx))
      .filter(abs(col("ut")) === col("k2"))
      .groupBy(col("nd"), col("k2"))
      .agg(min(col("day")).as("break_day"))
      .select(col("nd").as("n_days"),
        // Σr₂ = 2S_t, so s2 − t(N+1) IS the textbook U_t = 2S_t − t(N+1)
        col("k2").as("k_stat"),
        col("break_day"),
        round(least(lit(1.0), lit(2.0) * exp({
          val n = col("nd").cast("double")
          val kk = col("k2").cast("double")
          lit(-6.0) * kk * kk / (n * n * n + n * n)
        })), 6).as("p_approx"))
  }

  def singleBreak(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("k"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("yq"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("k"))
    val pre = daily
      .withColumn("t", row_number().over(w))
      .withColumn("sa", sum(dec(col("yq"))).over(
        w.rowsBetween(Long.MinValue, 0)))
      .withColumn("saa", sum(
        col("yq").cast("decimal(19,0)") * col("yq").cast("decimal(19,0)"))
        .over(w.rowsBetween(Long.MinValue, 0)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("ta", sum(dec(col("yq"))).over(wAll))
      .withColumn("taa", sum(
        col("yq").cast("decimal(19,0)") * col("yq").cast("decimal(19,0)"))
        .over(wAll))
      // next_day BEFORE the t < n candidate filter: computed after it,
      // the t = n-1 candidate's lead is null (its successor row was
      // filtered away) and a best break at the last candidate reports a
      // null break_day — hit at sf0.1 ('purchase', 2024-01-30) while
      // every sf0.01 series broke earlier. The oracle has always
      // computed the lead pre-filter.
      .withColumn("next_day", lead(col("day"), 1).over(w))
    // candidate split AFTER row t (t = 1 .. n-1): left stats are the
    // prefix at t, right stats the complement — O(1) per candidate
    val cands = pre.filter(col("t") < col("n"))
      .withColumn("nl", col("t").cast("double"))
      .withColumn("nr", (col("n") - col("t")).cast("double"))
      .withColumn("sseL",
        col("saa").cast("double") -
          col("sa").cast("double") * col("sa").cast("double") / col("nl"))
      .withColumn("sseR",
        (col("taa") - col("saa")).cast("double") -
          (col("ta") - col("sa")).cast("double") *
            (col("ta") - col("sa")).cast("double") / col("nr"))
      .withColumn("sse", col("sseL") + col("sseR"))
      .withColumn("mb", col("sa").cast("double") / col("nl") / 1e6)
      .withColumn("ma",
        (col("ta") - col("sa")).cast("double") / col("nr") / 1e6)
    cands
      .groupBy(col("k").as(keyCol))
      .agg(min(struct(col("sse"), col("t"),
        col("next_day").as("bd"), col("mb"), col("ma"))).as("best"))
      .select(col(keyCol), col("best.bd").as("break_day"),
        // SCALE-0 rounding (round(x·10^4)/10^4), not round(x, 4): scaled
        // rounding implementations disagree on exact .5@4dp ties (hit in
        // practice — a mean of 3031.93875), scale-0 half-up agrees
        (round(col("best.mb") * 1e4) / 1e4).as("mean_before"),
        (round(col("best.ma") * 1e4) / 1e4).as("mean_after"),
        (round(col("best.sse") / lit(1e12) * 1e4) / 1e4).as("sse"))
      .orderBy(col(keyCol))
  }
}
