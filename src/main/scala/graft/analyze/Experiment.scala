package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** A/B experiment analysis: deterministic variant assignment + the two
  * standard significance tests a product-analytics readout runs over an
  * event stream — Welch's unequal-variance t on a per-user value metric
  * and Pearson's chi-square on the conversion 2×2 table. The decision
  * layer downstream of the funnel/retention family (reference anchor:
  * the per-class count aggregations of `process_logs_v10.py` §counts,
  * taken to inference).
  *
  * Determinism contract (what makes this SQL-oracle-able):
  *  - variant assignment is the PORTABLE md5 unit hash
  *    ([[Sharding.hash32]] mod 2) of the unit id — any engine, any rerun,
  *    any partitioning recomputes the identical A/B membership (an engine
  *    RNG would not survive a resume, let alone a cross-engine audit);
  *  - each user's metric is an exact 6-dp long sum of the metric events'
  *    values ([[graft.operators.ExactAgg]]'s quantization), so the
  *    per-user double is bit-identical everywhere;
  *  - across users, moments come from exact DECIMAL(18,6) sums of m and
  *    m² (the [[Outliers]] contract — (18,6)² stays inside every
  *    engine's 38-digit decimal cap), with the Welch/chi-square formulas
  *    applied in double only at the very end over identical inputs.
  *
  * Scale shape: one user-keyed hash aggregate folds the event scan to a
  * per-user (variant, metric, converted) frame — the only corpus-sized
  * shuffle; the variant rollup is 2 rows, and the test statistics are a
  * driver-free 1×1 cross of those two rows. Nothing here grows with the
  * event count except the first aggregate.
  */
object Experiment {

  private def d19(c: Column): Column = c.cast("decimal(19,0)")

  /** CUPED variance reduction (Deng 2013 — the industry-standard
    * experiment sensitivity boost): adjust the experiment metric by the
    * PRE-experiment covariate, `y' = y − θ(x − x̄)` with
    * `θ = cov(x,y)/var(x)` estimated POOLED across arms (assignment is
    * independent of x, so pooling is unbiased and uses all data). One
    * row: θ, per-arm raw and adjusted means, and the variance-reduction
    * fraction `1 − (1−ρ²)` = ρ² the method guarantees in expectation.
    *
    * Exactness: x and y are exact 6-dp long sums per unit; all five
    * pooled moments are DECIMAL sums of DECIMAL(19,0)² products; θ, the
    * adjusted means (which need only arm means of x and y — algebra, not
    * a second pass) and ρ² run in double at the end.
    *
    * Scale shape: one unit-keyed aggregate over the corpus, then a 2-row
    * arm rollup and a 1-row moment aggregate. */
  def cuped(events: DataFrame, userCol: String, valueCol: String,
            preFilter: Column, postFilter: Column): DataFrame = {
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(
        sum(when(preFilter, v6).otherwise(0L)).as("xq"),
        sum(when(postFilter, v6).otherwise(0L)).as("yq"))
      .withColumn("variant",
        when(graft.operators.Sharding.hash32(col("unit")) % 2 === 0, "A")
          .otherwise("B"))
    val m = units.agg(
      count(lit(1)).as("n"),
      sum(d19(col("xq"))).as("sx"), sum(d19(col("yq"))).as("sy"),
      sum(d19(col("xq")) * d19(col("xq"))).as("sxx"),
      sum(d19(col("xq")) * d19(col("yq"))).as("sxy"),
      sum(d19(col("yq")) * d19(col("yq"))).as("syy"),
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("na"),
      sum(when(col("variant") === "A", d19(col("xq")))
        .otherwise(lit(0).cast("decimal(19,0)"))).as("sxa"),
      sum(when(col("variant") === "A", d19(col("yq")))
        .otherwise(lit(0).cast("decimal(19,0)"))).as("sya"))
    m.select({
        val n = col("n").cast("double")
        val cov = n * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        val vx = n * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val vy = n * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")
        val theta = when(vx > 0, cov / vx)
        val xbar = col("sx").cast("double") / n
        val nb = (col("n") - col("na")).cast("double")
        val mya = col("sya").cast("double") / col("na") / 1e6
        val myb = (col("sy") - col("sya")).cast("double") / nb / 1e6
        val mxa = col("sxa").cast("double") / col("na") / 1e6
        val mxb = (col("sx") - col("sxa")).cast("double") / nb / 1e6
        val rho2 = when(vx > 0 && vy > 0, cov * cov / (vx * vy))
        Seq(
          col("n"), col("na").as("n_a"), (col("n") - col("na")).as("n_b"),
          round(theta, 6).as("theta"),
          round(mya, 4).as("mean_y_a"), round(myb, 4).as("mean_y_b"),
          round(mya - theta * (mxa - xbar / 1e6), 4).as("mean_adj_a"),
          round(myb - theta * (mxb - xbar / 1e6), 4).as("mean_adj_b"),
          round(rho2, 6).as("var_reduction"))
      }: _*)
  }

  /** Cohen's d effect size between the hash arms (how BIG, where the
    * Welch t of [[abReport]] says how sure): `(m₁−m₂)/s_pooled` with the
    * pooled SD from exact DECIMAL moments — the number a meta-analysis
    * or an MDE plan consumes. */
  def cohensD(events: DataFrame, userCol: String, valueCol: String,
              metricFilter: Column): DataFrame = {
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(sum(when(metricFilter, v6).otherwise(0L)).as("mq"))
      .withColumn("arm1",
        when(graft.operators.Sharding.hash32(col("unit")) % 2 === 0, 1L)
          .otherwise(0L))
    units.agg(
        sum(col("arm1")).as("n1"),
        (count(lit(1)) - sum(col("arm1"))).as("n2"),
        sum(when(col("arm1") === 1, d19(col("mq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s1"),
        sum(when(col("arm1") === 0, d19(col("mq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s2"),
        sum(when(col("arm1") === 1, d19(col("mq")) * d19(col("mq")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ss1"),
        sum(when(col("arm1") === 0, d19(col("mq")) * d19(col("mq")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ss2"))
      .select(col("n1"), col("n2"), round({
        val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
        val m1 = col("s1").cast("double") / n1
        val m2 = col("s2").cast("double") / n2
        val v1 = (col("ss1").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / n1) / (n1 - 1)
        val v2 = (col("ss2").cast("double") -
          col("s2").cast("double") * col("s2").cast("double") / n2) / (n2 - 1)
        val sp = sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
        when(sp > 0, (m1 - m2) / sp)
      }, 6).as("cohens_d"))
  }

  /** Two-proportion sample-size calculator from the OBSERVED arms
    * (α = 0.05 two-sided, power = 0.8 — quantiles as literals):
    * `n/arm = (z_{α/2} + z_β)² (p_a(1−p_a) + p_b(1−p_b)) / Δ²`. Answers
    * "how many users would this experiment need to confirm the uplift it
    * is showing". Null when the observed Δ is zero. */
  def requiredSampleSize(events: DataFrame, userCol: String,
                         convFilter: Column): DataFrame = {
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(max(when(convFilter, 1L).otherwise(0L)).as("conv"))
      .withColumn("variant",
        when(graft.operators.Sharding.hash32(col("unit")) % 2 === 0, "A")
          .otherwise("B"))
    units.agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("variant") === "A", col("conv")).otherwise(0L)).as("ca"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("nb"),
        sum(when(col("variant") === "B", col("conv")).otherwise(0L)).as("cb"))
      .select({
        val pa = col("ca").cast("double") / col("na")
        val pb = col("cb").cast("double") / col("nb")
        val delta = pb - pa
        val z = lit(1.959964) + lit(0.841621)
        Seq(col("na").as("n_a"), col("nb").as("n_b"),
          round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
          when(delta =!= 0,
            ceil(z * z * (pa * (lit(1.0) - pa) + pb * (lit(1.0) - pb)) /
              (delta * delta)).cast("long")).as("n_required_per_arm"))
      }: _*)
  }

  /** Difference-in-differences: `(ȳ_T,post − ȳ_T,pre) − (ȳ_C,post −
    * ȳ_C,pre)` — the panel estimate that nets out both the group gap and
    * the time trend. Treatment = portable hash arm; periods from the
    * caller's filters; means are exact 6-dp sums over event rows. */
  def diffInDiff(events: DataFrame, userCol: String, valueCol: String,
                 preFilter: Column, postFilter: Column): DataFrame = {
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    val treated = graft.operators.Sharding.hash32(col(userCol)) % 2 === 0
    def cell(f: Column, t: Boolean): (Column, Column) = {
      val in = f && (if (t) treated else !treated)
      (sum(when(in, v6).otherwise(0L)), sum(when(in, 1L).otherwise(0L)))
    }
    val (stPre, ntPre) = cell(preFilter, t = true)
    val (stPost, ntPost) = cell(postFilter, t = true)
    val (scPre, ncPre) = cell(preFilter, t = false)
    val (scPost, ncPost) = cell(postFilter, t = false)
    events.agg(stPre.as("stpre"), ntPre.as("ntpre"), stPost.as("stpost"),
        ntPost.as("ntpost"), scPre.as("scpre"), ncPre.as("ncpre"),
        scPost.as("scpost"), ncPost.as("ncpost"))
      .select({
        def mean(s: Column, n: Column) =
          when(n > 0, s.cast("double") / n / 1e6)
        val mtPre = mean(col("stpre"), col("ntpre"))
        val mtPost = mean(col("stpost"), col("ntpost"))
        val mcPre = mean(col("scpre"), col("ncpre"))
        val mcPost = mean(col("scpost"), col("ncpost"))
        Seq(
          round(mtPre, 4).as("treat_pre"), round(mtPost, 4).as("treat_post"),
          round(mcPre, 4).as("control_pre"), round(mcPost, 4).as("control_post"),
          round((mtPost - mtPre) - (mcPost - mcPre), 4).as("did"))
      }: _*)
  }

  /** Per-user experiment frame: `(user, variant, metric, converted)`.
    * `metricFilter` selects the metric-bearing events (their `valueCol`
    * sums into the per-user metric, exact at 6 dp); `convFilter` defines
    * conversion (any matching event). Users appear iff they have any
    * event — the enrolled population. */
  def perUnit(events: DataFrame, userCol: String, valueCol: String,
              metricFilter: Column, convFilter: Column): DataFrame = {
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    events.groupBy(col(userCol).as("unit"))
      .agg(
        (sum(when(metricFilter, v6).otherwise(0L)).cast("double") / 1e6)
          .as("metric"),
        max(when(convFilter, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(Sharding.hash32(col("unit")) % 2 === 0, "A").otherwise("B"))
  }

  /** One-row experiment readout: per-variant n / conversions / rates /
    * metric means, Welch's t on the metric, chi-square on conversion.
    * Rates and statistics rounded to 4 dp (presentation); the inputs to
    * every formula are exact. */
  def abReport(events: DataFrame, userCol: String, valueCol: String,
               metricFilter: Column, convFilter: Column): DataFrame = {
    val units = perUnit(events, userCol, valueCol, metricFilter, convFilter)
    val m = col("metric").cast("decimal(18,6)")
    val stats = units.groupBy(col("variant")).agg(
      count(lit(1)).as("n"),
      sum(col("converted")).as("conv"),
      sum(m).cast("double").as("sx"),
      sum(m * m).cast("double").as("sxx"))
    val a = stats.filter(col("variant") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"),
        col("sx").as("sx_a"), col("sxx").as("sxx_a"))
    val b = stats.filter(col("variant") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"),
        col("sx").as("sx_b"), col("sxx").as("sxx_b"))
    def mean(sx: Column, n: Column): Column = sx / n
    // sample variance by the two-pass identity, guarded for n <= 1 (ANSI
    // division; a one-user arm has no variance, so Welch t goes null)
    def svar(sxx: Column, sx: Column, n: Column): Column =
      when(n > 1, (sxx - sx * sx / n) / (n - 1))
    val va = svar(col("sxx_a"), col("sx_a"), col("n_a"))
    val vb = svar(col("sxx_b"), col("sx_b"), col("n_b"))
    val se2 = va / col("n_a") + vb / col("n_b")
    // chi-square over the 2x2 (variant x converted) table in exact long
    // arithmetic until the final division; degenerate margins (all
    // converted / none converted) make the statistic null, not 0/0
    val n = col("n_a") + col("n_b")
    val convTot = col("conv_a") + col("conv_b")
    val nonTot = n - convTot
    val det = (col("conv_a") * (col("n_b") - col("conv_b")) -
      col("conv_b") * (col("n_a") - col("conv_a"))).cast("double")
    val chiDen = (col("n_a") * col("n_b")).cast("double") *
      (convTot * nonTot).cast("double")
    a.crossJoin(b).select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(col("conv_a").cast("double") / col("n_a"), 4).as("rate_a"),
      round(col("conv_b").cast("double") / col("n_b"), 4).as("rate_b"),
      round(mean(col("sx_a"), col("n_a")), 4).as("mean_a"),
      round(mean(col("sx_b"), col("n_b")), 4).as("mean_b"),
      round(when(se2 > 0,
        (mean(col("sx_a"), col("n_a")) - mean(col("sx_b"), col("n_b"))) /
          sqrt(se2)), 4).as("welch_t"),
      round(when(chiDen > 0, n.cast("double") * det * det / chiDen), 4)
        .as("chi2"))
  }

  /** Sample-ratio-mismatch check (the first thing to read on ANY A/B
    * dashboard: a 50.8/49.2 split on a million users is not noise, it is
    * a broken assignment pipeline): chi-square goodness of fit of the
    * per-variant unit counts against the uniform allocation. One row
    * `(n_units, n_variants, chi2, dof, srm_flag)`, flag = χ² above the
    * α = 0.001 critical value for its dof (literal table for dof ≤ 4 —
    * variant counts beyond 5 arms are a design smell, and NULL flags
    * them for human eyes rather than guessing a quantile).
    *
    * Exactness: χ² = (k/n)·Σo² − n over exact integer counts — one
    * double expression at the end, no per-cell float expectation. */
  def srmCheck(events: DataFrame, userCol: String, nVariants: Int): DataFrame = {
    // α=0.001 upper-tail chi-square critical values, dof 1..4
    val crit: Map[Int, Double] = Map(1 -> 10.828, 2 -> 13.816,
      3 -> 16.266, 4 -> 18.467)
    val units = events.groupBy(col(userCol).as("unit")).agg(count(lit(1)).as("__e"))
      .select(Sharding.shardId(col("unit"), nVariants).as("variant"))
    val byV = units.groupBy(col("variant")).agg(count(lit(1)).as("o"))
    byV.agg(sum(col("o")).as("n_units"), count(lit(1)).as("n_variants"),
        sum(d19(col("o")) * d19(col("o"))).as("oo"))
      .select(col("n_units"), col("n_variants"),
        round({
          lit(nVariants).cast("double") * col("oo").cast("double") /
            col("n_units") - col("n_units").cast("double")
        }, 4).as("chi2"),
        lit(nVariants - 1).cast("long").as("dof"),
        when(lit(crit.get(nVariants - 1).isDefined),
          (lit(nVariants).cast("double") * col("oo").cast("double") /
            col("n_units") - col("n_units").cast("double")) >
            lit(crit.getOrElse(nVariants - 1, Double.MaxValue)))
          .otherwise(lit(null).cast("boolean")).as("srm_flag"))
  }

  /** Wald's SPRT (1945) on the conversion rate of the event stream —
    * the sequential decision layer over [[abReport]]'s fixed-horizon
    * test: walk the units in their deterministic arrival order, add
    * `ln(p₁/p₀)` per conversion and `ln((1−p₁)/(1−p₀))` per
    * non-conversion, stop the moment the log-likelihood ratio leaves
    * `[ln(β/(1−α)), ln((1−β)/α)]`. One row:
    * `(n_units, decision, n_at_decision, llr_final)` where decision ∈
    * accept_h1 / accept_h0 / continue and `llr_final` is the LLR at the
    * stopping unit (or the last unit when no boundary is hit).
    *
    * Determinism: the two per-step increments are 12-dp-quantized
    * literal longs, so the cumulative LLR is an EXACT integer walk —
    * `llr_t = conv_t·L1 + (t−conv_t)·L0` needs only the cumulative
    * conversion count, and every boundary comparison is exact. Order is
    * the total `(first event ts, unit)` order of each unit's FIRST
    * event — a pure function of the data.
    *
    * Scale shape: one unit-keyed aggregate (first ts + converted flag),
    * one running-sum window over units ordered by arrival — the same
    * single-series window contract as the funnel/retention family — and
    * a 1-row driver-free summary via a min-struct aggregate over
    * boundary-crossing rows. */
  def sprt(events: DataFrame, userCol: String, tsCol: String,
           convFilter: Column, p0: Double, p1: Double,
           alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need 0 < p0 != p1 < 1: $p0, $p1")
    val l1 = math.round(math.log(p1 / p0) * 1e12) // per-conversion step
    val l0 = math.round(math.log((1 - p1) / (1 - p0)) * 1e12)
    val hi = math.round(math.log((1 - beta) / alpha) * 1e12)
    val lo = math.round(math.log(beta / (1 - alpha)) * 1e12)
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(min(col(tsCol)).as("t0"),
        max(when(convFilter, 1L).otherwise(0L)).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t0"), col("unit"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val walk = units
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("cv", sum(col("x")).over(w))
      .select(col("t"),
        (col("cv") * lit(l1) + (col("t") - col("cv")) * lit(l0)).as("llr12"))
    val crossed = walk
      .filter(col("llr12") >= lit(hi) || col("llr12") <= lit(lo))
      .agg(min(struct(col("t"), col("llr12"))).as("s"))
      .select(col("s.t").as("stop_t"), col("s.llr12").as("stop_llr"))
    val last = walk.agg(max(struct(col("t"), col("llr12"))).as("e"))
      .select(col("e.t").as("n_units"), col("e.llr12").as("last_llr"))
    last.crossJoin(broadcast(crossed))
      .select(col("n_units"),
        when(col("stop_llr").isNull, "continue")
          .when(col("stop_llr") >= lit(hi), "accept_h1")
          .otherwise("accept_h0").as("decision"),
        coalesce(col("stop_t"), col("n_units")).as("n_at_decision"),
        round(coalesce(col("stop_llr"), col("last_llr")).cast("double") / 1e12, 6)
          .as("llr_final"))
  }

  /** Re-randomization (permutation) test for the hash-arm mean
    * difference — the distribution-free p-value that needs no variance
    * formula at all: re-assign every unit's arm by an independent hash
    * of `(unit, b)` for `b = 1..B`, recompute the mean difference each
    * time, and count how many re-randomized |diffs| reach the observed
    * one; `p = (1 + #{|d_b| ≥ |d_obs|}) / (B + 1)` (the standard
    * add-one so p is never 0). One row
    * `(n_units, n_perms, diff_obs, p_value)`.
    *
    * Fully deterministic like [[Bootstrap.meanCi]]: permutation b is a
    * pure md5 function of (unit, b) — resumable, partition-invariant,
    * engine-portable. Each permuted diff is one pinned double of exact
    * DECIMAL sums, 9-dp-quantized before the ≥ compare (as is the
    * observed diff, so the comparison is exact integer vs integer).
    * Scale: one unit aggregate, a units×B fan-out into one
    * map-side-combined (b)-keyed aggregate, then a B-row count. */
  def permutationTest(events: DataFrame, userCol: String, valueCol: String,
                      metricFilter: Column, b: Int = 200): DataFrame = {
    require(b >= 19, s"need >= 19 permutations for any p below 0.05: $b")
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(sum(when(metricFilter, v6).otherwise(0L)).as("vq"))
    def diff9(grouped: DataFrame): DataFrame = grouped
      .select(round(when(col("n1") > 0 && col("n0") > 0,
        (col("s1").cast("double") / col("n1") -
          col("s0").cast("double") / col("n0")) / 1e6) * lit(1e9))
        .cast("long").as("d9"))
    val obs = diff9(units
      .withColumn("arm", Sharding.hash32(col("unit")) % 2)
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s1"),
        sum(when(col("arm") =!= 0, d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s0")))
      .select(col("d9").as("obs9"))
    val spark = events.sparkSession
    val bs = spark.range(1, b + 1).select(col("id").cast("int").as("b"))
    val perms = diff9(units.crossJoin(broadcast(bs))
      .withColumn("arm", Sharding.hash32(concat(col("unit").cast("string"),
        lit(":"), col("b").cast("string"))) % 2)
      .groupBy(col("b"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s1"),
        sum(when(col("arm") =!= 0, d19(col("vq")))
          .otherwise(lit(0).cast("decimal(19,0)"))).as("s0")))
    val nUnits = units.agg(count(lit(1)).as("n_units"))
    nUnits.crossJoin(broadcast(perms.crossJoin(broadcast(obs))
        .agg(count(lit(1)).as("n_perms"),
          sum(when(abs(col("d9")) >= abs(col("obs9")), 1L).otherwise(0L))
            .as("ge"),
          max(col("obs9")).as("o9"))))
      .select(col("n_units"), col("n_perms"),
        round(col("o9").cast("double") / 1e9, 6).as("diff_obs"),
        round((col("ge") + 1).cast("double") / (col("n_perms") + 1), 6)
          .as("p_value"))
  }

  /** Simpson's-paradox detector for the hash-arm mean comparison: does
    * the POOLED direction of the A−B metric difference contradict the
    * per-stratum directions? (The aggregation trap every dashboard
    * comparison is one confounder away from — a reversal means the arm
    * mix differs across strata and the pooled number is telling you
    * about the MIX, not the treatment.) One row:
    * `(n_strata, pooled_diff, n_agree, n_reversed, paradox)` — paradox
    * when a majority of (nonzero) strata point against the pooled sign.
    *
    * Exactness: per-(stratum, arm) sums are exact 6-dp longs in DECIMAL;
    * each diff is a pinned double of exact inputs; sign comparisons are
    * exact. Scale: one stratum×arm aggregate (category-bounded), then
    * arithmetic on that tiny frame. */
  def simpsonsCheck(events: DataFrame, userCol: String, valueCol: String,
                    stratum: Column): DataFrame = {
    val v6 = round(col(valueCol) * lit(1000000)).cast("long")
    val arm1 = Sharding.hash32(col(userCol)) % 2 === 0
    val cells = events.groupBy(stratum.as("st"))
      .agg(
        sum(when(arm1, 1L).otherwise(0L)).as("na"),
        sum(when(!arm1, 1L).otherwise(0L)).as("nb"),
        sum(when(arm1, d19(v6)).otherwise(lit(0).cast("decimal(19,0)"))).as("sa"),
        sum(when(!arm1, d19(v6)).otherwise(lit(0).cast("decimal(19,0)"))).as("sb"))
    val perStratum = cells
      .withColumn("diff", when(col("na") > 0 && col("nb") > 0,
        col("sa").cast("double") / col("na") - col("sb").cast("double") / col("nb")))
    val pooled = cells.agg(
        sum(col("na")).as("pna"), sum(col("nb")).as("pnb"),
        sum(col("sa").cast("decimal(38,0)")).as("psa"),
        sum(col("sb").cast("decimal(38,0)")).as("psb"))
      .select(when(col("pna") > 0 && col("pnb") > 0,
        col("psa").cast("double") / col("pna") -
          col("psb").cast("double") / col("pnb")).as("pd"))
    perStratum.crossJoin(broadcast(pooled))
      .agg(
        count(lit(1)).as("n_strata"),
        round(max(col("pd")) / 1e6, 6).as("pooled_diff"),
        sum(when(col("diff").isNotNull && col("diff") =!= 0 && col("pd") =!= 0 &&
          signum(col("diff")) === signum(col("pd")), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("diff").isNotNull && col("diff") =!= 0 && col("pd") =!= 0 &&
          signum(col("diff")) =!= signum(col("pd")), 1L).otherwise(0L)).as("n_reversed"))
      .withColumn("paradox", col("n_reversed") > col("n_agree"))
  }

  /** Covariate-balance table (standardized mean differences) between
    * the two hash arms — the pre-test an A/B readout should print
    * before any effect estimate: if the arms differ on pre-treatment
    * covariates (activity, spend, tenure), the randomization (or the
    * observational comparison) is suspect. Per covariate:
    * `SMD = (μ₁ − μ₀) / √((s₁² + s₀²)/2)` (the standard pooled form);
    * |SMD| > 0.1 is the conventional imbalance flag, reported as a
    * count.
    *
    * Exactness: per-user covariates are exact integers/6-dp longs; the
    * per-arm moments are exact DECIMAL sums; each SMD is one double
    * expression, 4 dp. Output one row per covariate:
    * `(covariate, n1, n0, mean1, mean0, smd)` ordered by name, plus
    * the flag count embedded per row as `flagged`.
    *
    * Scale shape: one user-keyed corpus aggregate, one melt to
    * (covariate, arm) cells, covariate-bounded moments. */
  def covariateBalance(events: DataFrame, userCol: String,
                       tsCol: String, valueCol: String): DataFrame = {
    val per = events.groupBy(col(userCol).as("unit"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * lit(1000000)).cast("long")).as("value6"),
        countDistinct(to_date(col(tsCol))).as("active_days"))
      .withColumn("arm1",
        when(Sharding.hash32(col("unit")) % 2 === 0, 1L).otherwise(0L))
    val melted = per.select(col("arm1"), explode(map(
      lit("n_events"), col("n_events"),
      lit("value6"), col("value6"),
      lit("active_days"), col("active_days"))).as(Seq("covariate", "x")))
    def d(c: Column) = c.cast("decimal(38,0)")
    val cells = melted.groupBy(col("covariate"), col("arm1"))
      .agg(count(lit(1)).as("n"), sum(d(col("x"))).as("sx"),
        sum(d(col("x")) * d(col("x"))).as("sxx"))
    val a1 = cells.where(col("arm1") === 1)
      .select(col("covariate"), col("n").as("n1"), col("sx").as("sx1"),
        col("sxx").as("sxx1"))
    val a0 = cells.where(col("arm1") === 0)
      .select(col("covariate"), col("n").as("n0"), col("sx").as("sx0"),
        col("sxx").as("sxx0"))
    a1.join(a0, "covariate")
      .select(Seq(col("covariate"), col("n1"), col("n0")) ++ {
        def mean(sx: Column, n: Column) = sx.cast("double") / n
        def svar(sxx: Column, sx: Column, n: Column) =
          when(n > 1, (sxx.cast("double") -
            sx.cast("double") * sx.cast("double") / n) / (n - 1))
        val m1 = mean(col("sx1"), col("n1")); val m0 = mean(col("sx0"), col("n0"))
        val v1 = svar(col("sxx1"), col("sx1"), col("n1"))
        val v0 = svar(col("sxx0"), col("sx0"), col("n0"))
        val pooled = sqrt((v1 + v0) / 2)
        val smd = when(pooled > 0, (m1 - m0) / pooled)
        Seq(round(m1, 4).as("mean1"), round(m0, 4).as("mean0"),
          round(smd, 4).as("smd"),
          // null-safe flag (an undefined SMD is NOT imbalance) —
          // mirrors the oracle's CASE WHEN NULL → 0 semantics
          coalesce((abs(smd) > 0.1).cast("long"), lit(0L)).as("flagged"))
      }: _*)
      .orderBy(col("covariate"))
  }

  /** Wilson score intervals for the two arms' conversion rates plus the
    * Newcombe (1998) score-based interval for their DIFFERENCE — the
    * interval the A/B readout should quote instead of the Wald ±1.96·SE
    * (which collapses at extreme rates and small arms; Wilson stays
    * inside [0,1] and keeps coverage):
    * `center = (p̂ + z²/2n)/(1 + z²/n)`,
    * `half = z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n)`; Newcombe composes the
    * per-arm score bounds into the difference bounds. z = 1.96 (95%,
    * documented literal). Per-unit conversion folds first (a user
    * converts once, however many events fire). One row:
    * `(n_a, conv_a, lo_a, hi_a, n_b, conv_b, lo_b, hi_b, diff,
    * diff_lo, diff_hi)` at 6 dp. Scale: one user-keyed corpus
    * aggregate, then 2-row arithmetic. */
  def wilsonAbReport(events: DataFrame, userCol: String,
                     convFilter: Column): DataFrame = {
    val z = 1.96
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(max(when(convFilter, 1L).otherwise(0L)).as("c"))
      .withColumn("arm",
        when(Sharding.hash32(col("unit")) % 2 === 0, "A").otherwise("B"))
    val stats = units.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("conv"))
    def wilson(n: Column, c: Column): (Column, Column, Column) = {
      val nn = n.cast("double")
      val p = c.cast("double") / nn
      val denom = lit(1.0) + lit(z * z) / nn
      val center = (p + lit(z * z) / (lit(2.0) * nn)) / denom
      val half = lit(z) * sqrt(p * (lit(1.0) - p) / nn +
        lit(z * z) / (lit(4.0) * nn * nn)) / denom
      (p, center - half, center + half)
    }
    val a = stats.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = stats.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(b).select({
      val (pa, loA, hiA) = wilson(col("n_a"), col("conv_a"))
      val (pb, loB, hiB) = wilson(col("n_b"), col("conv_b"))
      val diff = pa - pb
      Seq(col("n_a"), col("conv_a"),
        round(loA, 6).as("lo_a"), round(hiA, 6).as("hi_a"),
        col("n_b"), col("conv_b"),
        round(loB, 6).as("lo_b"), round(hiB, 6).as("hi_b"),
        round(diff, 6).as("diff"),
        round(diff - sqrt((pa - loA) * (pa - loA) +
          (hiB - pb) * (hiB - pb)), 6).as("diff_lo"),
        round(diff + sqrt((hiA - pa) * (hiA - pa) +
          (pb - loB) * (pb - loB)), 6).as("diff_hi"))
    }: _*)
  }

  /** Cronbach's alpha — internal-consistency reliability of the k-item
    * "scale" formed by per-user per-treatment counts (do the items move
    * together across users?): `α = k/(k−1)·(1 − Σσ_j²/σ_T²)` with
    * POPULATION variances (divide-by-n, documented — the convention
    * cancels in the ratio anyway). Per-item variances fold absent cells
    * as exact zeros WITHOUT a grid (`Σx²` over present cells, mean over
    * all users); the row-total variance comes from the same per-user
    * fold. One row: `(n_users, k, alpha)` at 4 dp.
    *
    * Scale shape: one (user, item)-keyed corpus aggregate, an item-
    * bounded moment aggregate, a user-keyed total fold. */
  def cronbachAlpha(df: DataFrame, unitCol: Column,
                    itemCol: Column): DataFrame = {
    val cells = df.groupBy(unitCol.as("u"), itemCol.as("t"))
      .agg(count(lit(1)).as("x"))
    val nUsers = cells.select(col("u")).distinct().count()
    val k = cells.select(col("t")).distinct().count()
    def d(c: Column) = c.cast("decimal(38,0)")
    // per-item population variance ×n²: n·Σx² − (Σx)² — exact integers
    val items = cells.groupBy(col("t"))
      .agg(sum(d(col("x"))).as("sx"), sum(d(col("x")) * d(col("x"))).as("sxx"))
      .select((lit(nUsers).cast("decimal(38,0)") * col("sxx") -
        col("sx") * col("sx")).as("vj_n2"))
      .agg(sum(col("vj_n2")).as("svj_n2"))
    val totals = cells.groupBy(col("u")).agg(sum(col("x")).as("ti"))
      .agg(sum(d(col("ti"))).as("st"), sum(d(col("ti")) * d(col("ti")))
        .as("stt"))
      .select((lit(nUsers).cast("decimal(38,0)") * col("stt") -
        col("st") * col("st")).as("vt_n2"))
    totals.crossJoin(broadcast(items))
      .select(lit(nUsers).as("n_users"), lit(k).as("k"),
        round({
          val kk = lit(k.toDouble)
          when(col("vt_n2") > 0 && lit(k) > 1,
            kk / (kk - 1) * (lit(1.0) -
              col("svj_n2").cast("double") / col("vt_n2").cast("double")))
        }, 4).as("alpha"))
  }

  /** Mantel-Haenszel stratified 2×2 association (Mantel & Haenszel
    * 1959): the common odds ratio of exposure (md5 arm) vs outcome
    * ACROSS day strata, plus the Cochran-Mantel-Haenszel chi-square —
    * the confounding-robust upgrade of the pooled 2×2 (and the formal
    * companion of the Simpson's-paradox audit above: when the strata
    * disagree with the pool, THIS is the number to report).
    *
    * `OR_MH = Σ(a_k·d_k/n_k) / Σ(b_k·c_k/n_k)`;
    * `CMH = (Σa_k − ΣE_k)² / ΣV_k` with `E = r1·c1/n`,
    * `V = r1·r2·c1·c2/(n²(n−1))` (no continuity correction,
    * documented). Every per-stratum rational is pinned ONCE to an
    * 8-dp long over exact integer cells, so the stratum sums are
    * order-invariant and engine-stable.
    *
    * Scale shape: one corpus aggregate to the (stratum × 2×2) frame
    * (strata-bounded), then strata-bounded arithmetic. Degenerate
    * strata (n ≤ 1) contribute zero to every sum. */
  def mantelHaenszel(events: DataFrame, userCol: String,
                     outcome: Column, tsCol: String): DataFrame = {
    val exposed = Sharding.hash32(col(userCol)) % 2 === 0
    val cells = events.groupBy(to_date(col(tsCol)).as("__day"))
      .agg(
        sum(when(exposed && outcome, 1L).otherwise(0L)).as("a"),
        sum(when(exposed && !outcome, 1L).otherwise(0L)).as("b"),
        sum(when(!exposed && outcome, 1L).otherwise(0L)).as("c"),
        sum(when(!exposed && !outcome, 1L).otherwise(0L)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast("double")
    def pin8(x: Column): Column = round(x * lit(1e8)).cast("long")
    val terms = cells.select(
      col("a"),
      when(n > 1, pin8(col("a").cast("double") * col("d") / n))
        .otherwise(0L).as("ad8"),
      when(n > 1, pin8(col("b").cast("double") * col("c") / n))
        .otherwise(0L).as("bc8"),
      when(n > 1, pin8((col("a") + col("b")).cast("double") *
        (col("a") + col("c")) / n)).otherwise(0L).as("e8"),
      when(n > 1, pin8((col("a") + col("b")).cast("double") *
        (col("c") + col("d")) * (col("a") + col("c")) * (col("b") + col("d"))
        / (n * n * (n - 1)))).otherwise(0L).as("v8"),
      when(n > 1, col("a")).otherwise(0L).as("a_eff"))
    terms.agg(
        count(lit(1)).as("n_strata"),
        sum(col("a_eff")).as("sum_a"),
        sum(col("ad8")).as("sad"), sum(col("bc8")).as("sbc"),
        sum(col("e8")).as("se"), sum(col("v8")).as("sv"))
      .select(col("n_strata"), col("sum_a"),
        round(when(col("sbc") > 0,
          col("sad").cast("double") / col("sbc")), 6).as("or_mh"),
        round(when(col("sv") > 0, {
          val diff = col("sum_a").cast("double") - col("se").cast("double") / 1e8
          diff * diff / (col("sv").cast("double") / 1e8)
        }), 4).as("cmh"))
  }

  /** Bayesian A/B readout on the conversion rate: Beta(1,1)-prior
    * posteriors per arm, `P(B > A)` and a 95% credible interval for the
    * lift under the normal approximation of the posterior difference —
    * the decision-facing companion to [[abReport]]'s frequentist t/χ²
    * (a stakeholder asks "what's the chance B is better", not "is
    * p < .05"). Φ comes from [[graft.functions.Phi]] — the SAME
    * elementary-op erf approximation runs in the DuckDB twin, so the
    * probability is bit-reproducible. One row: `(n_a, n_b, conv_a,
    * conv_b, lift_mean, ci_lo, ci_hi, p_b_beats_a)` — lift at 6 dp,
    * probability at 4. Scale: one unit-keyed aggregate, then arm rows. */
  def bayesAb(events: DataFrame, userCol: String,
              convFilter: Column): DataFrame = {
    val units = events.groupBy(col(userCol).as("unit"))
      .agg(max(when(convFilter, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(Sharding.hash32(col("unit")) % 2 === 0, "A").otherwise("B"))
    val stats = units.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    val a = stats.filter(col("variant") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = stats.filter(col("variant") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(b).select({
      def post(n: Column, c: Column): (Column, Column) = {
        val al = c.cast("double") + 1.0
        val be = (n - c).cast("double") + 1.0
        val s = al + be
        (al / s, al * be / (s * s * (s + 1)))
      }
      val (ma, va) = post(col("n_a"), col("conv_a"))
      val (mb, vb) = post(col("n_b"), col("conv_b"))
      val lift = mb - ma
      val sd = sqrt(va + vb)
      Seq(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(lift, 6).as("lift_mean"),
        round(lift - lit(1.959963984540054) * sd, 6).as("ci_lo"),
        round(lift + lit(1.959963984540054) * sd, 6).as("ci_hi"),
        round(graft.functions.Phi.phi(lift / sd), 4).as("p_b_beats_a"))
    }: _*)
  }

  /** Sharp regression-discontinuity estimate at a known cutoff of the
    * running variable: local-linear fits of the outcome on `(x − c)`
    * within bandwidth `h` on each side; the effect is the difference of
    * the two fitted intercepts AT the cutoff (Imbens & Lemieux 2008) —
    * the design for "did crossing the threshold itself change the
    * outcome" when assignment is deterministic in x. One row:
    * `(n_left, n_right, int_left, int_right, effect)` at 6 dp.
    *
    * Exactness: centered x quantizes to a 6-dp long, the 0/1 outcome is
    * exact; per-side OLS moments are exact DECIMAL sums pivoted into one
    * row (the [[graft.analyze.Regression.chow]] shape), intercepts one
    * double expression. Scale: one filtered corpus aggregate. */
  def rdd(df: DataFrame, runningCol: Column, outcome: Column,
          cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0, s"need bandwidth > 0: $bandwidth")
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val q = df
      .filter(runningCol >= cutoff - bandwidth &&
        runningCol < cutoff + bandwidth)
      .select(round((runningCol - lit(cutoff)) * lit(1000000)).cast("long")
          .as("x"),
        when(outcome, 1L).otherwise(0L).as("y"),
        when(runningCol >= cutoff, 1L).otherwise(0L).as("side"))
    val sides = q.groupBy(col("side"))
      .agg(count(lit(1)).as("n"), sum(d19(col("x"))).as("sx"),
        sum(col("y")).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"))
    val wide = sides.agg(
      sum(when(col("side") === 0, col("n")).otherwise(0L)).as("n1"),
      sum(when(col("side") === 1, col("n")).otherwise(0L)).as("n2"),
      max(when(col("side") === 0, col("sx"))).as("sx1"),
      max(when(col("side") === 0, col("sy"))).as("sy1"),
      max(when(col("side") === 0, col("sxx"))).as("sxx1"),
      max(when(col("side") === 0, col("sxy"))).as("sxy1"),
      max(when(col("side") === 1, col("sx"))).as("sx2"),
      max(when(col("side") === 1, col("sy"))).as("sy2"),
      max(when(col("side") === 1, col("sxx"))).as("sxx2"),
      max(when(col("side") === 1, col("sxy"))).as("sxy2"))
    def intercept(n: Column, sx: Column, sy: Column, sxx: Column,
                  sxy: Column): Column = {
      val nd = n.cast("double")
      val den = nd * sxx.cast("double") -
        sx.cast("double") * sx.cast("double")
      val b = (nd * sxy.cast("double") -
        sx.cast("double") * sy.cast("double")) / den
      (sy.cast("double") - b * sx.cast("double")) / nd
    }
    wide.select({
      val il = intercept(col("n1"), col("sx1"), col("sy1"), col("sxx1"),
        col("sxy1"))
      val ir = intercept(col("n2"), col("sx2"), col("sy2"), col("sxx2"),
        col("sxy2"))
      Seq(col("n1").as("n_left"), col("n2").as("n_right"),
        round(il, 6).as("int_left"), round(ir, 6).as("int_right"),
        round(ir - il, 6).as("effect"))
    }: _*)
  }

  /** Delta-method inference for a RATIO metric (revenue per event,
    * CTR, tokens per document): `R̂ = ΣX/ΣY` over i.i.d. units, with
    * `Var(R̂) ≈ (σ²_x − 2R̂σ_xy + R̂²σ²_y) / (n·ȳ²)` (Deng et al. 2013's
    * formulation) — the correct SE the naive per-row t-test gets wrong
    * because rows within a unit are correlated. One row
    * `(n_units, ratio, se, ci_lo, ci_hi)` at 95%.
    *
    * Per-unit numerators/denominators are exact 6-dp longs; the five
    * co-moments are exact DECIMALs; doubles only in the closing algebra
    * (identical single IEEE ops on both engines). */
  def ratioDelta(df: DataFrame, unitCol: Column, numCol: Column,
                 denCol: Column): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    val per = df.groupBy(unitCol.as("u"))
      .agg(sum(round(numCol * lit(1000000)).cast("long")).as("xq"),
        sum(round(denCol * lit(1000000)).cast("long")).as("yq"))
    val m = per.agg(count(lit(1)).as("n"),
      sum(d38(col("xq"))).as("sx"), sum(d38(col("yq"))).as("sy"),
      sum(d38(col("xq")) * d38(col("xq"))).as("sxx"),
      sum(d38(col("yq")) * d38(col("yq"))).as("syy"),
      sum(d38(col("xq")) * d38(col("yq"))).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val r = sx / sy
    val ybar = sy / n
    val vx = (col("sxx").cast("double") - sx * sx / n) / (n - 1)
    val vy = (col("syy").cast("double") - sy * sy / n) / (n - 1)
    val cxy = (col("sxy").cast("double") - sx * sy / n) / (n - 1)
    val se = sqrt((vx - cxy * r * 2 + vy * r * r) / (n * ybar * ybar))
    m.select(col("n").as("n_units"),
      // sy = 0 → the ratio itself is undefined; same guard as the
      // siblings so the degenerate row reads null, not NaN/Infinity
      round(when(col("sy") > 0, r), 6).as("ratio"),
      round(when(col("n") >= 2 && col("sy") > 0, se), 6).as("se"),
      round(when(col("n") >= 2 && col("sy") > 0, r - se * 1.959964), 6)
        .as("ci_lo"),
      round(when(col("n") >= 2 && col("sy") > 0, r + se * 1.959964), 6)
        .as("ci_hi"))
  }

  /** Leave-one-unit-out JACKKNIFE for the same ratio — the
    * assumption-free cross-check of [[ratioDelta]] (no Taylor
    * expansion): `R_(−i) = (ΣX − x_i)/(ΣY − y_i)`,
    * `SE² = (n−1)/n · Σ(R_(−i) − R̄_J)²`. One row
    * `(n_units, ratio, se_jack, ci_lo, ci_hi)`.
    *
    * Scale shape: the totals are a broadcast scalar row; every unit's
    * leave-one-out replicate is one division, pinned to a 12-dp long so
    * the replicate moments are exact order-free sums — the classic
    * "resampling without resampling" trick for linearizable statistics. */
  def ratioJackknife(df: DataFrame, unitCol: Column, numCol: Column,
                     denCol: Column): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    // persist the unit fold and take the totals as DRIVER SCALARS (the
    // Bm25 constants pattern): a crossJoin(broadcast(tot)) variant was
    // measured to (a) recompute the whole fold for the totals branch
    // and (b) shuffle the unit frame on the CONSTANT scalar columns in
    // its closing aggregate — a single-reducer wall at scale
    val per = df.groupBy(unitCol.as("u"))
      .agg(sum(round(numCol * lit(1000000)).cast("long")).as("xq"),
        sum(round(denCol * lit(1000000)).cast("long")).as("yq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totRow = per.agg(count(lit(1)).as("n"),
      sum(d38(col("xq"))).as("sx"), sum(d38(col("yq"))).as("sy")).head()
    val nL = totRow.getLong(0)
    // exact decimal totals → the same double CAST(sx AS DOUBLE) the
    // oracle takes, so every replicate division sees identical inputs
    val sxd = totRow.getDecimal(1).doubleValue()
    val syd = totRow.getDecimal(2).doubleValue()
    // a unit holding the ENTIRE denominator makes its replicate division
    // by zero → Inf/NaN; such replicates are undefined — drop them from
    // the moment sums (both engines would otherwise emit garbage moments)
    val reps = per
      .filter(lit(syd) - col("yq") =!= 0.0)
      .select(round((lit(sxd) - col("xq")) / (lit(syd) - col("yq")) *
        lit(1e12)).cast("long").as("r12"))
      .agg(count(lit(1)).as("nrep"), sum(d38(col("r12"))).as("sr"),
        sum(d38(col("r12")) * d38(col("r12"))).as("srr"))
    val n = lit(nL).cast("double")
    val r = lit(sxd) / lit(syd)
    val ssd = col("srr").cast("double") -
      col("sr").cast("double") * col("sr").cast("double") / n
    val se = sqrt((n - 1) / n * ssd) / 1e12
    // SE is defined only when every replicate was (nrep == n); a
    // dropped replicate means the jackknife itself is degenerate → null
    val ok = lit(nL) >= 2 && col("nrep") === lit(nL)
    reps.select(lit(nL).as("n_units"),
      round(when(lit(syd) =!= 0.0, r), 6).as("ratio"),
      round(when(ok, se), 6).as("se_jack"),
      round(when(ok, r - se * 1.959964), 6).as("ci_lo"),
      round(when(ok, r + se * 1.959964), 6).as("ci_hi"))
  }

  /** Post-stratified A/B difference (the design-based cousin of
    * [[cuped]]): reweight each stratum's arm means by the POOLED
    * stratum share `w_s = n_s/N`, removing the imbalance a lucky hash
    * split leaves in the raw difference;
    * `Var = Σ w_s²·(v_1s/n_1s + v_0s/n_0s)`. One row
    * `(n_strata, n_1, n_0, delta_raw, delta_ps, se_ps)` — strata with
    * an empty arm contribute their share to neither estimator (dropped,
    * documented). */
  def postStratified(df: DataFrame, unitCol: Column, valueCol: Column,
                     strataCol: Column, armFilter: Column): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    val per = df.select(strataCol.as("s"),
        when(armFilter, 1).otherwise(0).as("arm"),
        round(valueCol * lit(1000000)).cast("long").as("vq"))
      .groupBy(col("s"), col("arm"))
      .agg(count(lit(1)).as("nc"), sum(d38(col("vq"))).as("sc"),
        sum(d38(col("vq")) * d38(col("vq"))).as("qc"))
    val wide = per.groupBy(col("s")).agg(
      max(when(col("arm") === 1, col("nc"))).as("n1"),
      max(when(col("arm") === 1, col("sc"))).as("s1"),
      max(when(col("arm") === 1, col("qc"))).as("q1"),
      max(when(col("arm") === 0, col("nc"))).as("n0"),
      max(when(col("arm") === 0, col("sc"))).as("s0"),
      max(when(col("arm") === 0, col("qc"))).as("q0"))
      .filter(col("n1").isNotNull && col("n0").isNotNull)
    def mean(s: Column, nc: Column) = s.cast("double") / nc / 1e6
    def va(q: Column, s: Column, nc: Column) =
      (q.cast("double") - s.cast("double") * s.cast("double") / nc) /
        (nc - 1) / 1e12
    // stratum shares from the POOLED kept population; per-stratum
    // pieces pinned to 12-dp longs so the cross-strata sums are
    // order-free (strata counts are usually small, but free is free)
    val tot = wide.agg(sum(col("n1") + col("n0")).as("nn"),
      sum(col("n1")).as("nt1"), sum(col("n0")).as("nt0"),
      sum(col("s1")).as("st1"), sum(col("s0")).as("st0"),
      count(lit(1)).as("n_strata"))
    wide.crossJoin(broadcast(tot))
      .groupBy(col("n_strata"), col("nn"), col("nt1"), col("nt0"),
        col("st1"), col("st0"))
      .agg(
        sum(round({
          val w = (col("n1") + col("n0")).cast("double") / col("nn")
          w * (mean(col("s1"), col("n1")) - mean(col("s0"), col("n0"))) *
            lit(1e12)
        }).cast("long")).as("dps12"),
        sum(round({
          val w = (col("n1") + col("n0")).cast("double") / col("nn")
          w * w * (va(col("q1"), col("s1"), col("n1")) / col("n1") +
            va(col("q0"), col("s0"), col("n0")) / col("n0")) * lit(1e12)
        }).cast("long")).as("vps12"))
      .select(col("n_strata"), col("nt1").as("n_1"), col("nt0").as("n_0"),
        round(col("st1").cast("double") / col("nt1") / 1e6 -
          col("st0").cast("double") / col("nt0") / 1e6, 6).as("delta_raw"),
        round(col("dps12").cast("double") / 1e12, 6).as("delta_ps"),
        round(when(col("vps12") >= 0, sqrt(col("vps12").cast("double") / 1e12)),
          6).as("se_ps"))
  }
}
