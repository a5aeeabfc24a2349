package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Median / MAD robust outlier report — the heavy-tail-proof sibling of
  * [[Outliers.zscores]]: mean±stddev moves with the outliers it is
  * supposed to flag, median and median-absolute-deviation do not
  * (breakdown point 50%, Hampel 1974).
  *
  * Engine-portable determinism: values are 6-dp quantized longs and both
  * medians are the EXACT LOWER MEDIAN — the value at rank `(n+1) div 2`
  * under the total order `(value, tie)` — so there is no float midpoint
  * interpolation and no engine-specific percentile algorithm anywhere
  * (`percentile_approx`/`quantile_disc` disagree across engines by
  * construction).
  *
  * Scale shape: two group-keyed window sorts (value rank, then deviation
  * rank) and two small joins of the |groups|-row median frames back onto
  * the stream (broadcast — the group count is bounded). No driver
  * collection; each window partition is one group, the same shuffle key
  * reused for both passes. Skewed groups are real rows, not buffered
  * arrays.
  */
object RobustStats {

  /** Per-group trimmed mean: drop the exact `floor(n·trim)` smallest and
    * largest rows by `(value, tie)` rank and average the core — the
    * between-option of the mean (outlier-dragged) and the median
    * (information-discarding). Sums over the kept core are exact 6-dp
    * longs; one rank window per group. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String, trim: Double = 0.05): DataFrame = {
    require(trim >= 0 && trim < 0.5, s"trim out of [0, 0.5): $trim")
    val q = df.select(col(groupCol).as("g"), col(tieCol).as("tie"),
      round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val wg = Window.partitionBy(col("g")).orderBy(col("vq"), col("tie"))
    q.withColumn("rn", row_number().over(wg))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .withColumn("k", floor(col("n") * lit(trim)).cast("long"))
      .filter(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        (round(sum(col("vq")).cast("double") / 100.0 /
          count(lit(1))) / 1e4).as("trimmed_mean"))
      .orderBy(col(groupCol))
  }

  /** Exact two-sample Kolmogorov-Smirnov D between `sampleFilter` rows
    * and the rest: `D = max |F₁ − F₂|` over the pooled distinct values,
    * computed as `max |c₁·n₂ − c₂·n₁| / (n₁·n₂)` in EXACT integer
    * cross-multiplication — no float CDF ever compared. The z-scaled
    * statistic `D·√(n₁n₂/(n₁+n₂))` is reported for reference (4 dp).
    *
    * Scale shape: one (value → per-sample count) aggregate, cumulative
    * sums over the DISTINCT-value frame (single-partition window over
    * distinct values — bounded by value cardinality, not rows; quantize
    * coarser upstream if the domain is truly continuous at scale). */
  def ksTest(df: DataFrame, valueCol: String, sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("vq"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("vq"))
      .agg(sum(col("s1")).as("a1"), sum(lit(1L) - col("s1")).as("a2"))
    val w = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, 0)
    val cum = byV
      .withColumn("c1", sum(col("a1")).over(w))
      .withColumn("c2", sum(col("a2")).over(w))
    val tot = q.agg(sum(col("s1")).as("n1"),
      (count(lit(1)) - sum(col("s1"))).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("c1").cast("decimal(19,0)") * col("n2").cast("decimal(19,0)") -
          col("c2").cast("decimal(19,0)") * col("n1").cast("decimal(19,0)"))
          .as("num"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("num")).as("mx"))
      .select(col("n1"), col("n2"),
        round(col("mx").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")), 6).as("d"),
        round(col("mx").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")) *
          sqrt(col("n1").cast("double") * col("n2").cast("double") /
            (col("n1") + col("n2")).cast("double")), 4).as("ks_z"))
  }

  /** Two-sample Cramér-von Mises statistic — the WHOLE-CDF companion to
    * [[ksTest]] (KS sees only the single worst gap; CvM integrates the
    * squared gap over every pooled observation, so a distribution that
    * differs a little everywhere — the shape-drift signature KS is blind
    * to — still registers):
    * `T = Σ ct·(c₁n₂ − c₂n₁)² / (N²·n₁·n₂)` over the distinct-value
    * frame with multiplicities ct — the textbook
    * `(n₁n₂/N²)·Σ(F̂₁−F̂₂)²` with every CDF comparison cross-multiplied
    * into EXACT integers (the [[ksTest]] trick); one double division at
    * the very end. Same scale shape as KS: one corpus aggregate to the
    * distinct-value frame, one running window over it. */
  def cvmTest(df: DataFrame, valueCol: String, sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("vq"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("vq"))
      .agg(sum(col("s1")).as("a1"), sum(lit(1L) - col("s1")).as("a2"))
    val w = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, 0)
    val cum = byV
      .withColumn("c1", sum(col("a1")).over(w))
      .withColumn("c2", sum(col("a2")).over(w))
    val tot = q.agg(sum(col("s1")).as("n1"),
      (count(lit(1)) - sum(col("s1"))).as("n2"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        (d38(col("a1") + col("a2")) *
          d38(col("c1") * col("n2") - col("c2") * col("n1")) *
          d38(col("c1") * col("n2") - col("c2") * col("n1"))).as("term"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).as("s"))
      .select(col("n1"), col("n2"),
        round(col("s").cast("double") /
          ((col("n1") + col("n2")).cast("double") *
            (col("n1") + col("n2")).cast("double") *
            col("n1").cast("double") * col("n2").cast("double")), 6)
          .as("cvm_t"))
  }

  /** Per-group `(group, n, median, mad, n_outliers)` where outliers are
    * rows with `|vq − median| > cutoff · mad` in exact integer
    * arithmetic. */
  def madReport(df: DataFrame, groupCol: String, valueCol: String,
                tieCol: String, cutoff: Int = 3): DataFrame = {
    val q = df.select(col(groupCol).as("g"), col(tieCol).as("tie"),
      round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val wg = Window.partitionBy(col("g"))
    def lowerMedian(in: DataFrame, valCol: String, outCol: String): DataFrame =
      in.withColumn("__rn",
          row_number().over(wg.orderBy(col(valCol), col("tie"))))
        .withColumn("__n", count(lit(1)).over(wg))
        .filter(col("__rn") === floor((col("__n") + 1) / 2)) // integer (n+1) div 2: Spark's `/` is double division
        .select(col("g"), col(valCol).as(outCol))
    val med = lowerMedian(q, "vq", "med")
    val dev = q.join(broadcast(med), "g")
      .withColumn("dev", abs(col("vq") - col("med")))
    val mad = lowerMedian(dev.select(col("g"), col("tie"), col("dev")),
      "dev", "mad")
    dev.join(broadcast(mad), "g")
      .groupBy(col("g").as(groupCol))
      .agg(
        count(lit(1)).as("n"),
        (max(col("med")).cast("double") / 1e6).as("median"),
        (max(col("mad")).cast("double") / 1e6).as("mad"),
        sum(when(col("dev") > lit(cutoff) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col(groupCol))
  }

  /** Jarque-Bera normality test on a value column: one row
    * `(n, skewness, kurtosis_excess, jb)` with
    * `JB = n/6 · (S² + K²/4)` — the moment-based normality screen (is
    * this metric's residual bell-shaped enough for the t/F machinery
    * upstream to mean anything?).
    *
    * Exactness: values quantize to 2-dp longs (the raw powers must stay
    * inside DECIMAL(38): at 2 dp a 1e7-magnitude value's 4th power times
    * 1e9 rows still fits; 6 dp would overflow by 16 orders), raw moments
    * S₁..S₄ are exact DECIMAL sums, and the central-moment closed forms
    * `m₂ = S₂/n − μ²` etc. run in double over those exact integers —
    * order-invariant on any engine. NULL when n < 2 or variance is 0. */
  def jarqueBera(df: DataFrame, valueCol: String): DataFrame = {
    val v = round(col(valueCol) * lit(100)).cast("long")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val x = d38(v)
    df.agg(
        count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      .select(col("n"), round({
          val n = col("n").cast("double")
          val m = col("s1").cast("double") / n
          val m2 = col("s2").cast("double") / n - m * m
          val m3 = col("s3").cast("double") / n - m * col("s2").cast("double") / n * 3 + m * m * m * 2
          when(col("n") >= 2 && m2 > 0, m3 / pow(m2, 1.5))
        }, 6).as("skewness"),
        round({
          val n = col("n").cast("double")
          val m = col("s1").cast("double") / n
          val m2 = col("s2").cast("double") / n - m * m
          val m4 = col("s4").cast("double") / n -
            m * col("s3").cast("double") / n * 4 +
            m * m * col("s2").cast("double") / n * 6 - m * m * m * m * 3
          when(col("n") >= 2 && m2 > 0, m4 / (m2 * m2) - 3)
        }, 6).as("kurtosis_excess"),
        round({
          val n = col("n").cast("double")
          val m = col("s1").cast("double") / n
          val m2 = col("s2").cast("double") / n - m * m
          val m3 = col("s3").cast("double") / n - m * col("s2").cast("double") / n * 3 + m * m * m * 2
          val m4 = col("s4").cast("double") / n -
            m * col("s3").cast("double") / n * 4 +
            m * m * col("s2").cast("double") / n * 6 - m * m * m * m * 3
          val sk = m3 / pow(m2, 1.5)
          val ku = m4 / (m2 * m2) - 3
          when(col("n") >= 2 && m2 > 0, n / 6 * (sk * sk + ku * ku / 4))
        }, 4).as("jb"))
  }

  /** Anderson-Darling uniformity test of a `(0,1)`-valued column — the
    * randomness audit for HASH-derived uniforms (is the salt/shard hash
    * actually uniform? feeds the q88/q137 skew toolkit): one row
    * `(n, a_sq)` with
    * `A² = −n − (1/n)·Σᵢ (2i−1)(ln uᵢ + ln(1−u_{n+1−i}))`, folded to the
    * single-pass form `Σᵢ [(2i−1)·ln uᵢ + (2n+1−2i)·ln(1−uᵢ)]` over the
    * ascending rank i (the reversed-index pairing re-indexed — no second
    * sort). AD weights the CDF tails where a bad hash leaks first, which
    * plain KS under-weighs by construction.
    *
    * Determinism: the rank is a total order over `(u, tie)`; each row's
    * log term is one pinned double expression quantized to a 9-dp long
    * and summed exactly. The global rank is assigned DISTRIBUTED
    * ([[graft.operators.Positional.withRowIndex]] — range shuffle +
    * per-partition offsets), never a one-task global window. */
  def adUniformity(df: DataFrame, uCol: Column, tieCol: Column): DataFrame = {
    val ranked = graft.operators.Positional.withRowIndex(
      df.select(uCol.as("u"), tieCol.as("tie"))
        .filter(col("u") > 0 && col("u") < 1),
      Seq(col("u"), col("tie")), "__i0")
    // the reversed-pair weight (2n+1−2i) splits as 2n·1 + (1−2i), so
    // three n-free per-row log terms (each one pinned double, 9-dp
    // quantized, exactly summed) recombine with exact integer arithmetic:
    // Σ(2i−1)ln uᵢ + Σ(2n+1−2i)ln(1−uᵢ) = A + 2n·C − B
    ranked
      .withColumn("i", col("__i0") + 1)
      .groupBy()
      // per-term longs but DECIMAL sums: the rank-weighted terms total
      // O(n²·1e9) — past a long's range before n reaches one million
      .agg(count(lit(1)).as("n"),
        sum(round((lit(2) * col("i") - 1).cast("double") *
          log(col("u")) * lit(1e9)).cast("long").cast("decimal(19,0)")).as("a9"),
        sum(round((lit(2) * col("i") - 1).cast("double") *
          log(lit(1.0) - col("u")) * lit(1e9)).cast("long").cast("decimal(19,0)")).as("b9"),
        sum(round(log(lit(1.0) - col("u")) * lit(1e9)).cast("long").cast("decimal(19,0)")).as("c9"))
      .select(col("n"),
        // 2n·C exceeds a long at corpus n (n ~ 1e6 × C ~ n·1e9) — the
        // recombination runs in DECIMAL(38,0)
        round(-col("n").cast("double") -
          (col("a9").cast("decimal(38,0)") +
            (lit(2) * col("n")).cast("decimal(19,0)") * col("c9").cast("decimal(19,0)") -
            col("b9").cast("decimal(38,0)")).cast("double") /
            1e9 / col("n"), 4).as("a_sq"))
  }

  /** L-moments (Hosking 1990) of the value distribution — the
    * order-statistics moment family: L-scale, L-CV, L-skewness τ₃ and
    * L-kurtosis τ₄ exist whenever the mean does and resist outliers
    * classical skew/kurtosis (q253) amplify; the hydrology-standard
    * shape summary for heavy-tailed corpora.
    *
    * Probability-weighted moments `b_r = Σ x₍ᵢ₎·C(i−1,r) / (n·C(n−1,r))`
    * need per-observation RANK WEIGHTS, but never per-observation rows:
    * within a tied group occupying ranks `[C+1, C+c]`, the binomial
    * weight sums collapse by the hockey-stick identity to
    * `C(C+c, r+1) − C(C, r+1)` — exact integer closed forms per
    * DISTINCT value, so the whole computation is a value-histogram
    * aggregate with a distinct-value cumulative window (the
    * [[ksTest]] bound) and exact DECIMAL b_r numerators.
    *
    * `λ₁ = b₀`, `λ₂ = 2b₁−b₀`, `λ₃ = 6b₂−6b₁+b₀`,
    * `λ₄ = 20b₃−30b₂+12b₁−b₀`; ratios `τ = λ₂/λ₁`, `τ₃ = λ₃/λ₂`,
    * `τ₄ = λ₄/λ₂`. One row:
    * `(n, l1, l2, l_cv, tau3, tau4)` at 6 dp. */
  def lMoments(df: DataFrame, valueCol: String): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"))
    val g = q.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val ranked = g.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
    def d(c: Column) = c.cast("decimal(38,0)")
    // hockey-stick: Σ_{i=cb+1}^{cb+c} C(i−1, r) = C(cb+c, r+1) − C(cb, r+1)
    // with C(m,1)=m, C(m,2)=m(m−1)/2, C(m,3)=m(m−1)(m−2)/6,
    // C(m,4)=m(m−1)(m−2)(m−3)/24 — exact DECIMAL throughout
    def choose(m: Column, k: Int): Column = k match {
      case 1 => d(m)
      case 2 => d(m) * (d(m) - 1) / 2
      case 3 => d(m) * (d(m) - 1) * (d(m) - 2) / 6
      case 4 => d(m) * (d(m) - 1) * (d(m) - 2) * (d(m) - 3) / 24
    }
    def wsum(r: Int): Column = // Σ over the group of C(i−1, r)
      if (r == 0) d(col("c"))
      else choose(col("cb") + col("c"), r + 1) - choose(col("cb"), r + 1)
    val agg = ranked.agg(
      sum(d(col("c"))).as("n"),
      sum(d(col("v")) * wsum(0)).as("s0"),
      sum(d(col("v")) * wsum(1)).as("s1"),
      sum(d(col("v")) * wsum(2)).as("s2"),
      sum(d(col("v")) * wsum(3)).as("s3"))
    agg.select(Seq(col("n").cast("long").as("n")) ++ {
      val n = col("n").cast("double")
      // b_r = s_r / (n·C(n−1, r)) — denominators in double (exact
      // integer inputs; the same expression shape on both engines)
      // small-n guards: b_r needs n > r observations (ANSI division —
      // a 3-row frame must yield null τ₄, not a divide-by-zero)
      val b0 = col("s0").cast("double") / n
      val b1 = when(col("n") > 1,
        col("s1").cast("double") / (n * (n - 1)))
      val b2 = when(col("n") > 2,
        col("s2").cast("double") / (n * (n - 1) * (n - 2) / 2))
      val b3 = when(col("n") > 3,
        col("s3").cast("double") / (n * (n - 1) * (n - 2) * (n - 3) / 6))
      val l1 = b0 / 1e6
      val l2 = (lit(2.0) * b1 - b0) / 1e6
      val l3 = (lit(6.0) * b2 - lit(6.0) * b1 + b0) / 1e6
      val l4 = (lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0) / 1e6
      Seq(round(l1, 6).as("l1"), round(l2, 6).as("l2"),
        round(when(abs(l1) > 0, l2 / l1), 6).as("l_cv"),
        round(when(abs(l2) > 0, l3 / l2), 6).as("tau3"),
        round(when(abs(l2) > 0, l4 / l2), 6).as("tau4"))
    }: _*)
  }

  /** Negative-binomial method-of-moments fit of per-unit counts — the
    * parametric reading of overdispersion (q231's dispersion index says
    * "burstier than Poisson"; this says HOW, as the NB's `r` and `p`):
    * `p̂ = m/s²`, `r̂ = m²/(s² − m)`, defined only when `s² > m`
    * (under-dispersed corpora report a null fit with the dispersion
    * ratio still printed). Exact integer count moments; the fit is one
    * double expression. One row:
    * `(n_units, mean, dispersion, r, p)` at 4/6 dp. */
  def negBinFit(df: DataFrame, unitCol: Column): DataFrame = {
    val per = df.groupBy(unitCol.as("u")).agg(count(lit(1)).as("x"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    per.agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"))
      .select(Seq(col("n").as("n_units")) ++ {
        val n = col("n").cast("double")
        val m = col("sx").cast("double") / n
        val v = when(col("n") > 1,
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / n) / (n - 1))
        Seq(round(m, 4).as("mean"),
          round(when(m > 0, v / m), 4).as("dispersion"),
          round(when(v > m, m * m / (v - m)), 6).as("r"),
          round(when(v > m, m / v), 6).as("p"))
      }: _*)
  }

  /** Hodges-Lehmann one-sample location estimator over the daily total
    * series — the median of all pairwise Walsh averages
    * `(y_i + y_j)/2, i ≤ j`: ~√n-efficient like the mean, 29%-breakdown
    * robust like the median, the natural point estimate to pair with
    * the rank tests ([[RankStats.mannWhitney]] confidence intervals
    * invert exactly this statistic). Median is EXACT (middle element,
    * or the average of the two middles, of the sorted Walsh multiset —
    * never an interpolated quantile sketch).
    *
    * Exactness: daily totals are 6-dp longs; doubled Walsh values
    * `y_i + y_j` stay exact longs; the exact median of an even count
    * averages two exact longs. Scale: the corpus folds to days; the
    * pair frame and its rank window are days²-bounded (a study-window
    * constant squared — the Theil-Sen bound, documented there too).
    * One row: `(n_days, n_pairs, hl)` at 6 dp. */
  def hodgesLehmann(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("yq"))
    val a = daily.select(col("day").as("d1"), col("yq").as("y1"))
    val b = daily.select(col("day").as("d2"), col("yq").as("y2"))
    val walsh = a.join(b, col("d1") <= col("d2"))
      .select((col("y1") + col("y2")).as("w2"))
    val wr = Window.orderBy(col("w2"))
    val ranked = walsh.withColumn("rn", row_number().over(wr))
    val nd = daily.count()
    val m = nd * (nd + 1) / 2
    val mids = if (m % 2 == 1) Seq(m / 2 + 1) else Seq(m / 2, m / 2 + 1)
    ranked.where(col("rn").isin(mids: _*))
      .agg(avg(col("w2").cast("double")).as("__w2"))
      .select(lit(nd).as("n_days"), lit(m).as("n_pairs"),
        round(col("__w2") / 2e6, 6).as("hl"))
  }

  /** K-sample Anderson-Darling (Scholz & Stephens 1987, the
    * tie-adjusted A²akN with midranks): do k samples share ONE
    * distribution — the tail-weighted, whole-CDF upgrade of pairwise
    * [[ksTest]]/[[cvmTest]] runs (AD's 1/(F(1−F)) weight sees tail
    * drift those miss, and one statistic replaces k(k−1)/2 pairs).
    * `A² = (N−1)/N · Σ_i (1/n_i) Σ_j (l_j/N)·(N·M_aij − n_i·B_aj)² /
    * (B_aj(N−B_aj) − N·l_j/4)` over distinct-value blocks j, with
    * midrank counts M_a/B_a.
    *
    * Determinism: doubled midrank counts (2M_a, 2B_a) are exact longs
    * off the distinct-value fold (the ×2 cancels between numerator and
    * denominator); each (class, block) term is one double expression
    * over exact integers, pinned to a 6-dp long before the exact sum.
    * Scale: one corpus aggregate to the (value, class) cell frame;
    * windows run on the distinct-value (× k) frame only. Output
    * `(k, n, a2_akn, mean_h0)` at 4 dp — under H₀ E[A²] = k−1; NULL
    * when every value ties (single block). */
  def adKSample(df: DataFrame, classCol: Column, valueCol: Column): DataFrame = {
    val q = df.select(classCol.as("cls"),
      round(valueCol * lit(1000000)).cast("long").as("v"))
    val cells = q.groupBy(col("v"), col("cls")).agg(count(lit(1)).as("cnt"))
    val byV = cells.groupBy(col("v")).agg(sum(col("cnt")).as("ct"))
    val tot = byV.agg(sum(col("ct")).as("nn"))
    val clsTot = cells.groupBy(col("cls")).agg(sum(col("cnt")).as("ni"))
    val wAll = Window.orderBy(col("v")).rowsBetween(Long.MinValue, 0)
    val bb = byV.withColumn("cum", sum(col("ct")).over(wAll))
      .select(col("v"), col("ct"),
        (lit(2) * col("cum") - col("ct")).as("b2"))
    val grid = byV.select(col("v")).crossJoin(broadcast(clsTot))
      .join(cells, Seq("v", "cls"), "left")
      .select(col("v"), col("cls"), col("ni"),
        coalesce(col("cnt"), lit(0L)).as("li"))
    val wci = Window.partitionBy(col("cls")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    val g2 = grid.withColumn("cumi", sum(col("li")).over(wci))
      .withColumn("m2", lit(2) * col("cumi") - col("li"))
      .join(bb, "v")
      .crossJoin(broadcast(tot))
    g2.select(col("nn"), col("cls"),
        // (l_j/n_i)·ratio per (class, block), 6-dp-pinned; doubles from
        // the first operand on so the shape survives 100 TB counts
        round(when(col("b2").cast("double") *
          (lit(2.0) * col("nn") - col("b2")) - col("nn").cast("double") *
          col("ct") > 0, {
          val num = col("nn").cast("double") * col("m2") -
            col("ni").cast("double") * col("b2")
          val den = col("b2").cast("double") *
            (lit(2.0) * col("nn") - col("b2")) -
            col("nn").cast("double") * col("ct")
          col("ct") * (num * num / den) / col("ni") * lit(1e6)
        })).cast("long").as("t6"))
      .groupBy(col("nn"))
      .agg(countDistinct(col("cls")).as("k"), sum(col("t6")).as("s6"))
      .select(col("k"), col("nn").as("n"),
        round(when(col("k") >= 2 && col("s6").isNotNull,
          (col("nn") - 1).cast("double") /
            (col("nn").cast("double") * col("nn")) *
            (col("s6").cast("double") / lit(1e6))), 4).as("a2_akn"),
        (col("k") - 1).cast("long").as("mean_h0"))
  }

  /** Normal QQ table at the 1/nq..(nq−1)/nq quantiles: sample lower
    * quantile (element ⌈p·N⌉ — an actual data value) against the
    * FITTED-normal theoretical quantile `m + s·Φ⁻¹(p)` via the shared
    * [[graft.functions.Probit]] — the localization companion to
    * [[lilliefors]]' single-number verdict (WHERE does the sample leave
    * normality: heavy right tail shows as positive gaps at high p).
    *
    * Exactness: quantile positions are integer ceilings, picked off the
    * distinct-value fold's inclusive cumulative (the block containing
    * the position); m and s are doubles off exact DECIMAL moments.
    * Scale: one value fold; everything downstream is (nq−1)-bounded.
    * Output `(p, sample_q, theoretical_q, gap)` at 4/6 dp, ordered. */
  def qqNormal(df: DataFrame, valueCol: String, nq: Int = 10): DataFrame = {
    require(nq >= 2, s"need nq >= 2: $nq")
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val byV = q.groupBy(col("vq")).agg(count(lit(1)).as("ct"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val tot = byV.agg(sum(col("ct")).as("n"),
      sum(d19(col("vq")) * d19(col("ct"))).as("s"),
      sum(d38(col("vq")) * d38(col("vq")) * d38(col("ct"))).as("qq"))
    val w = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, 0)
    val cum = byV.withColumn("cum", sum(col("ct")).over(w))
    val probs = tot.select(col("n"), col("s"), col("qq"),
      explode(sequence(lit(1), lit(nq - 1))).as("i"))
      .withColumn("pos",
        call_function("div", col("i") * col("n") + lit(nq - 1).cast("long"),
          lit(nq.toLong)))
    probs.join(cum,
        col("cum") >= col("pos") && col("cum") - col("ct") < col("pos"))
      .select(
        round(col("i").cast("double") / nq, 4).as("p"),
        round(col("vq").cast("double") / 1e6, 6).as("sample_q"),
        round(when(col("n") >= 2, {
          val m = col("s").cast("double") / col("n")
          val sd = sqrt((col("qq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1))
          (m + sd * graft.functions.Probit.probit(
            col("i").cast("double") / nq)) / 1e6
        }), 6).as("theoretical_q"),
        round(when(col("n") >= 2, {
          val m = col("s").cast("double") / col("n")
          val sd = sqrt((col("qq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1))
          (col("vq") - (m + sd * graft.functions.Probit.probit(
            col("i").cast("double") / nq))) / 1e6
        }), 6).as("gap"))
      .orderBy(col("p"))
  }

  /** Lilliefors normality test (Lilliefors 1967): the one-sample KS
    * distance against a normal with ESTIMATED mean and sd — the
    * composite-null upgrade of a plain KS-vs-N(μ,σ) (estimating the
    * parameters shrinks D; Lilliefors' tables, not KS's, apply) and the
    * whole-CDF complement to [[jarqueBera]]'s two-moment readout.
    * `D = max_v max(|F̂⁺(v) − Φ(z_v)|, |Φ(z_v) − F̂⁻(v)|)` over distinct
    * values, with F̂⁻/F̂⁺ the exclusive/inclusive empirical CDF steps.
    *
    * Determinism: m and s are doubles off exact DECIMAL moments
    * (identical expressions on both engines), Φ is the shared
    * [[graft.functions.Phi]] A&S sequence, and each per-value gap is
    * pinned to 9 dp before the max — so the max is over bit-identical
    * doubles. Scale: one value-keyed fold; the cumulative window runs on
    * distinct values only (the [[ksTest]] shape). Output one row
    * `(n, mean, sd, d_stat, sqrt_n_d)` at 6/4 dp; NULL D when n < 2 or
    * zero variance. */
  def lilliefors(df: DataFrame, valueCol: String): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("vq"))
    val byV = q.groupBy(col("vq")).agg(count(lit(1)).as("ct"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val tot = byV.agg(sum(col("ct")).as("n"),
      sum(d19(col("vq")) * d19(col("ct"))).as("s"),
      sum(d38(col("vq")) * d38(col("vq")) * d38(col("ct"))).as("qq"))
    val w = Window.orderBy(col("vq")).rowsBetween(Long.MinValue, 0)
    byV.withColumn("cum", sum(col("ct")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("s"), col("qq"),
        round(when(col("n") >= 2 && col("qq").cast("double") * col("n") >
          col("s").cast("double") * col("s").cast("double"), {
          val m = col("s").cast("double") / col("n")
          val sd = sqrt((col("qq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1))
          val ph = graft.functions.Phi.phi((col("vq") - m) / sd)
          val hi = col("cum").cast("double") / col("n")
          val lo = (col("cum") - col("ct")).cast("double") / col("n")
          greatest(abs(hi - ph), abs(ph - lo))
        }), 9).as("gap"))
      .groupBy(col("n"), col("s"), col("qq"))
      .agg(max(col("gap")).as("d0"))
      .select(col("n"),
        round(col("s").cast("double") / col("n") / 1e6, 6).as("mean"), {
          val v = (col("qq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1)
          round(when(col("n") >= 2, sqrt(v) / 1e6), 6).as("sd")
        },
        round(when(col("n") >= 2 && col("qq").cast("double") * col("n") >
          col("s").cast("double") * col("s").cast("double"), col("d0")), 6)
          .as("d_stat"),
        round(when(col("n") >= 2 && col("qq").cast("double") * col("n") >
          col("s").cast("double") * col("s").cast("double"),
          col("d0") * sqrt(col("n").cast("double"))), 4).as("sqrt_n_d"))
  }

  /** Yuen's trimmed-means test (Yuen 1974) between `sampleFilter` rows
    * (arm 1) and the rest: the outlier-proof Welch t — compare
    * `trimNum/trimDen`-trimmed means with winsorized variances and
    * Welch-style df. One row
    * `(n1, n2, h1, h2, tm1, tm2, t, df)` with `g_k = ⌊n_k·p⌋` trimmed
    * from EACH tail, `h_k = n_k − 2g_k` kept,
    * `d_k = SSD_wk / (h_k·(h_k − 1))` (SSD of the winsorized sample),
    * `t = (tm1 − tm2)/√(d1 + d2)`,
    * `df = (d1+d2)² / (d1²/(h1−1) + d2²/(h2−1))`.
    *
    * Scale shape: NO per-row ranking — the per-arm distinct-value fold
    * carries (value, count, cumulative-below); the kept mass of each
    * distinct value is a closed-form clamp `min(cum, n−g) − max(cum<,
    * g)`, the winsor bounds are conditional MINs over the fold, and
    * every sum is an exact DECIMAL of 1e6-quantized values. The trim
    * fraction is the exact rational `trimNum/trimDen` (integer ⌊n·p⌋ in
    * both engines — no float-floor seam). */
  def yuenTest(df: DataFrame, valueCol: String, sampleFilter: Column,
               trimNum: Int = 1, trimDen: Int = 5): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && trimNum * 2 < trimDen,
      s"trim must be in [0, 0.5): $trimNum/$trimDen")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1).otherwise(0).as("arm"))
    val byV = q.groupBy(col("arm"), col("v")).agg(count(lit(1)).as("ct"))
    val w = Window.partitionBy(col("arm")).orderBy(col("v"))
      .rowsBetween(Long.MinValue, -1)
    val cum = byV
      .withColumn("cumlt", coalesce(sum(col("ct")).over(w), lit(0L)))
      .withColumn("cum", col("cumlt") + col("ct"))
      .withColumn("n", sum(col("ct")).over(Window.partitionBy(col("arm"))))
      // integral ⌊n·p⌋ — Column./ would be DOUBLE division, so use the
      // SQL `div` operator (mirrors DuckDB's `//`)
      .withColumn("g", expr(s"(n * $trimNum) div $trimDen"))
    val perArm = cum
      .withColumn("kept", greatest(lit(0L),
        least(col("cum"), col("n") - col("g")) -
          greatest(col("cumlt"), col("g"))))
      .groupBy(col("arm"))
      .agg(max(col("n")).as("n"), max(col("g")).as("g"),
        sum(d38(col("v")) * d38(col("kept"))).as("tsum"),
        sum(d38(col("v")) * d38(col("v")) * d38(col("kept"))).as("tss"),
        min(when(col("cum") >= col("g") + 1, col("v"))).as("vlo"),
        min(when(col("cum") >= col("n") - col("g"), col("v"))).as("vhi"))
      .withColumn("h", col("n") - col("g") * 2)
      // winsorized sample = kept band + g copies of each clamp bound
      .withColumn("wsum", col("tsum") +
        d38(col("g")) * d38(col("vlo")) + d38(col("g")) * d38(col("vhi")))
      .withColumn("wss", col("tss") +
        d38(col("g")) * d38(col("vlo")) * d38(col("vlo")) +
        d38(col("g")) * d38(col("vhi")) * d38(col("vhi")))
    // pivot the two arm rows into one result row
    def arm(a: Int, c: Column) = max(when(col("arm") === a, c))
    val piv = perArm.agg(
      arm(1, col("n")).as("n1"), arm(0, col("n")).as("n2"),
      arm(1, col("h")).as("h1"), arm(0, col("h")).as("h2"),
      arm(1, col("tsum")).as("ts1"), arm(0, col("tsum")).as("ts2"),
      arm(1, col("wsum")).as("ws1"), arm(0, col("wsum")).as("ws2"),
      arm(1, col("wss")).as("wq1"), arm(0, col("wss")).as("wq2"))
    val tm1 = col("ts1").cast("double") / col("h1") / 1e6
    val tm2 = col("ts2").cast("double") / col("h2") / 1e6
    def dk(wq: Column, ws: Column, n: Column, h: Column) =
      (wq.cast("double") - ws.cast("double") * ws.cast("double") / n) /
        (h.cast("double") * (h - 1)) / 1e12
    val d1 = dk(col("wq1"), col("ws1"), col("n1"), col("h1"))
    val d2 = dk(col("wq2"), col("ws2"), col("n2"), col("h2"))
    val ok = col("h1") >= 2 && col("h2") >= 2
    piv.select(col("n1"), col("n2"), col("h1"), col("h2"),
      round(tm1, 6).as("tm1"), round(tm2, 6).as("tm2"),
      round(when(ok && d1 + d2 > 0, (tm1 - tm2) / sqrt(d1 + d2)), 4).as("t"),
      round(when(ok && d1 + d2 > 0, (d1 + d2) * (d1 + d2) /
        (d1 * d1 / (col("h1") - 1) + d2 * d2 / (col("h2") - 1))), 2).as("df"))
  }

  /** Lilliefors-type exponentiality test of per-unit INTER-ARRIVAL gaps
    * — "are arrivals memoryless (Poisson)?" asked of the GAPS, where
    * [[graft.analyze.Trend.dispersionIndex]] asks it of the counts.
    * Gaps are microsecond differences between consecutive events of the
    * SAME unit (cross-unit boundaries contribute nothing); the test is
    * `D = sup|F_n(x) − (1 − e^{−x/x̄})|` with the mean ESTIMATED from
    * the sample (the Lilliefors correction — plain KS overstates fit).
    * One row `(n_gaps, mean_gap_sec, d_stat, sqrt_n_d)`.
    *
    * Same fold discipline as [[lilliefors]]: distinct gap values, both
    * CDF one-sided limits, per-value gaps pinned at 9 dp before the
    * max; the only transcendental is one exp of bit-identical doubles
    * per DISTINCT value. */
  def lillieforsExponential(df: DataFrame, unitCol: Column,
                            tsCol: Column): DataFrame = {
    val wu = Window.partitionBy(col("__u")).orderBy(col("__ts"))
    val gaps = df.select(unitCol.as("__u"), tsCol.as("__ts"))
      .withColumn("__prev", lag(col("__ts"), 1).over(wu))
      .filter(col("__prev").isNotNull)
      .select((unix_micros(col("__ts")) - unix_micros(col("__prev")))
        .as("g"))
    val byV = gaps.groupBy(col("g")).agg(count(lit(1)).as("ct"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val tot = byV.agg(sum(col("ct")).as("n"),
      sum(d19(col("g")) * d19(col("ct"))).as("s"))
    val w = Window.orderBy(col("g")).rowsBetween(Long.MinValue, 0)
    byV.withColumn("cum", sum(col("ct")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("s"),
        round(when(col("n") >= 2 && col("s") > 0, {
          val xbar = col("s").cast("double") / col("n")
          val ft = lit(1.0) - exp(-col("g").cast("double") / xbar)
          val hi = col("cum").cast("double") / col("n")
          val lo = (col("cum") - col("ct")).cast("double") / col("n")
          greatest(abs(hi - ft), abs(ft - lo))
        }), 9).as("gap"))
      .groupBy(col("n"), col("s"))
      .agg(max(col("gap")).as("d0"))
      .select(col("n").as("n_gaps"),
        round(col("s").cast("double") / col("n") / 1e6, 4).as("mean_gap_sec"),
        round(when(col("n") >= 2 && col("s") > 0, col("d0")), 6).as("d_stat"),
        round(when(col("n") >= 2 && col("s") > 0,
          col("d0") * sqrt(col("n").cast("double"))), 4).as("sqrt_n_d"))
  }
}
