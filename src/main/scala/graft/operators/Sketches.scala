package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB answers to questions
  * whose exact forms need a full shuffle of distinct values.
  *
  * All built-ins (HLL++ and quantile sketches are native Catalyst
  * aggregates with map-side partial merge): an approx distinct count over
  * 100 TB moves kilobytes of sketch per partition instead of the distinct
  * key set; exact `countDistinct` moves the keys.
  */
object Sketches {

  /** Per-key approximate distinct count (HyperLogLog++). `rsd` is the
    * target relative standard deviation (default 5%). */
  def approxDistinctPerKey(df: DataFrame, keyCol: String, valueCol: String,
                           rsd: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate quantiles via the native percentile_approx sketch. */
  def approxQuantilesPerKey(df: DataFrame, keyCol: String, valueCol: String,
                            quantiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(keyCol))
      .agg(percentile_approx(col(valueCol),
        array(quantiles.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Count-min point estimates (Cormode & Muthukrishnan 2005) for a probe
    * key set, via the native `count_min_sketch` aggregate (map-side
    * mergeable — kilobytes of counters per partition cross the shuffle,
    * never the keys). The guarantee reported alongside each estimate:
    * `exact ≤ estimate ≤ exact + ε·N` with probability `confidence` —
    * one-sided overcount only, the property the spec pins.
    *
    * `probes` is driver-provided by design (a monitoring probe list is
    * configuration); the stream is aggregated ONCE into a single sketch
    * and each probe is answered from it. */
  def cmsEstimates(df: DataFrame, keyCol: String, probes: Seq[String],
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df.select(
        count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
          .as("s"))
      .head().getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    probes.map(p => (p, cms.estimateCount(p), cms.totalCount()))
      .toDF("key", "estimate", "total")
      .orderBy(col("key"))
  }

  /** PORTABLE count-min estimates: the same sketch semantics as
    * [[cmsEstimates]] but with the md5-derived row-hash family the
    * portable MinHash/SimHash variants use (`bucket_j(k) = first 8 md5
    * hex chars of "j:k", mod width`), so the whole pipeline — hashing,
    * bucket counting, min-over-rows readout — is reproducible as ANSI
    * SQL on any engine (the q24/q25/q26 oracle discipline; the Spark
    * `count_min_sketch` fast path above stays the library default).
    *
    * Scale shape: each input row contributes `depth` `(j, bucket)` pairs
    * whose partial counts combine map-side, so the shuffle carries at
    * most `depth × width` counters per partition — kilobytes at any
    * corpus size, never the keys (the CMS point). The probe readout
    * joins the ≤`depth × width`-row counter frame broadcast. */
  def cmsEstimatesPortable(df: DataFrame, keyCol: String,
                           probes: Seq[String],
                           depth: Int = 5, width: Int = 2048): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1 width>=2; got $depth/$width")
    val spark = df.sparkSession
    import spark.implicits._
    def bucket(j: Column, k: Column): Column =
      pmod(conv(substring(md5(concat_ws(":", j, k)), 1, 8), 16, 10)
        .cast("long"), lit(width.toLong))
    val keyed = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
    val counts = keyed
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .groupBy(col("j"), bucket(col("j"), col("k")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val total = keyed.count()
    val probeBuckets = probes.toDF("key")
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("key"), col("j"), bucket(col("j"), col("key")).as("bucket"))
    probeBuckets.join(broadcast(counts), Seq("j", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
      .select(col("key"), col("estimate"), lit(total).as("total"))
      .orderBy(col("key"))
  }

  /** PORTABLE HyperLogLog per-key distinct estimate (Flajolet 2007) —
    * the md5-hash sibling of [[approxDistinctPerKey]], fully
    * reproducible as ANSI SQL: `h` = first 15 md5 hex chars (60 bits),
    * register index = low `p` bits, rho = leading-zero rank of the
    * remaining `60-p` bits (via the engine-portable `lpad(bin(w))`
    * first-'1' position), estimate = the published `α·m²/Z` with
    * linear-counting small-range correction. The harmonic-mean
    * denominator `Z = Σ 2^-M_j` is folded as an EXACT integer
    * (`Σ 2^(maxRho - M_j)` over set registers plus `2^maxRho` per empty
    * one, ≤ 2^61 at p=12) so no float-sum order leaks in; the only
    * float steps are two divisions and one `ln`, identical expressions
    * on both engines. No large-range correction: at a 60-bit hash space
    * its 2^60/30 threshold is unreachable.
    *
    * Scale shape: one `(key, idx)` aggregate (map-side combined, ≤ m
    * rows per key cross the shuffle) then one per-key fold — the
    * mergeable-sketch shuffle contract, never the value set. */
  def hllPortable(df: DataFrame, keyCol: String, valueCol: String,
                  p: Int = 12): DataFrame = {
    val regs = hllRegs(df.select(col(keyCol).as("key"), col(valueCol).as("v0")),
      Seq("key"), p)
    hllFold(regs, Seq("key"), p)
      .select(col("key"), col("nset").as("registers_set"),
        col("approx_distinct"))
      .orderBy(col("key"))
  }

  /** Shared portable-HLL register derivation: `(keys..., idx, v)` — the
    * per-group max-rho register frame (map-side combined; ≤ 2^p rows per
    * group cross the shuffle). Input must expose the hashed value as
    * `v0`. */
  private def hllRegs(keyed: DataFrame, keyCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16; got $p")
    val m = 1 << p
    val wBits = 60 - p
    val maxRho = wBits + 1
    val hv = conv(substring(md5(col("v0").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val pos = instr(lpad(bin(shiftright(col("h"), p)), wBits, "0"), "1")
    val ks = keyCols.map(col)
    keyed.filter(col("v0").isNotNull)
      .select(ks :+ hv.as("h"): _*)
      .select(ks ++ Seq(col("h").bitwiseAND(lit((m - 1).toLong)).as("idx"),
        when(pos === 0, lit(maxRho)).otherwise(pos).cast("long").as("rho")): _*)
      .groupBy((keyCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).as("v"))
  }

  /** Shared portable-HLL estimate fold: exact-integer harmonic
    * denominator, published `α·m²/Z` with the linear-counting
    * small-range branch. Input = a register frame `(keys..., idx, v)`;
    * output = `(keys..., nset, approx_distinct)` (1 dp). */
  private def hllFold(regs: DataFrame, keyCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val alphaM =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709 else if (m == 32) 0.697 else 0.673
    val aNum = alphaM * m * m * math.pow(2.0, maxRho) // α·m²·SCALE, one double
    val folded = regs.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("nset"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxRho - v AS INT))")).as("ip"))
    val iCol = col("ip") + (lit(m.toLong) - col("nset")) * lit(1L << maxRho)
    val raw = lit(aNum) / iCol.cast("double")
    val zerosD = (lit(m.toLong) - col("nset")).cast("double")
    val est = when(raw <= lit(2.5 * m) && col("nset") < m,
      lit(m.toDouble) * log(lit(m.toDouble) / zerosD)).otherwise(raw)
    folded.select(keyCols.map(col) ++ Seq(col("nset"),
      round(est, 1).as("approx_distinct")): _*)
  }

  /** Mergeable distinct ROLLUP on the portable-HLL family (the md5
    * sibling of the Datasketches `hll_union_agg` rollup): per-(key, day)
    * register frames UNIONED to per-key totals by a plain max-per-
    * register aggregate — the mergeable-sketch contract (kilobytes of
    * registers cross the day boundary, never keys), and every step ANSI
    * SQL. Output `(key, n_days, approx_distinct)` (1 dp). */
  def hllPortableRollup(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, p: Int = 12): DataFrame = {
    val keyed = df.select(col(keyCol).as("key"),
      date_trunc("day", col(tsCol)).as("day"), col(valueCol).as("v0"))
    val daily = hllRegs(keyed, Seq("key", "day"), p)
    val merged = daily.groupBy(col("key"), col("idx")).agg(max(col("v")).as("v"))
    val nDays = keyed.filter(col("v0").isNotNull)
      .groupBy(col("key")).agg(countDistinct(col("day")).as("n_days"))
    hllFold(merged, Seq("key"), p)
      .join(nDays, "key")
      .select(col("key"), col("n_days"), col("approx_distinct"))
      .orderBy(col("key"))
  }

  /** Pairwise distinct-set overlap on the portable-HLL family: per-key
    * estimates, pairwise register-union estimates (max per register over
    * the two keys' frames), inclusion-exclusion intersection clamped at
    * 0 — the md5 sibling of the Datasketches `hll_union` overlap.
    * The pair frame is |keys|² rows (keys are a bounded dimension);
    * register union work is `pairs × m`, map-side combined. */
  def hllPortableOverlap(df: DataFrame, keyCol: String, valueCol: String,
                         p: Int = 12): DataFrame = {
    val regs = hllRegs(df.select(col(keyCol).as("key"), col(valueCol).as("v0")),
      Seq("key"), p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perKey = hllFold(regs, Seq("key"), p)
      val pairs = perKey.select(col("key").as("ka"), col("approx_distinct").as("est_a"))
        .join(perKey.select(col("key").as("kb"), col("approx_distinct").as("est_b")),
          col("ka") < col("kb"))
      val uregs = regs.join(broadcast(pairs.select(col("ka"), col("kb"))),
          col("key") === col("ka") || col("key") === col("kb"))
        .groupBy(col("ka"), col("kb"), col("idx")).agg(max(col("v")).as("v"))
      val union = hllFold(uregs, Seq("ka", "kb"), p)
        .select(col("ka"), col("kb"), col("approx_distinct").as("est_union"))
      pairs.join(union, Seq("ka", "kb"))
        .select(col("ka").as("key_a"), col("kb").as("key_b"),
          col("est_a"), col("est_b"), col("est_union"),
          greatest(round(col("est_a") + col("est_b") - col("est_union"), 1),
            lit(0.0)).as("est_intersect"))
        .orderBy(col("key_a"), col("key_b"))
        .localCheckpoint(true)
    } finally regs.unpersist(blocking = false)
  }

  /** PORTABLE quantile estimate via a fixed-width histogram sketch —
    * the mergeable, order-independent quantile family (counts per
    * `floor(v/w)` bin combine map-side; ≤ #bins rows per key cross the
    * shuffle), reproducible as ANSI SQL, unlike GK/KLL whose register
    * state is insertion-order- and engine-dependent. Estimate = linear
    * interpolation inside the first bin whose cumulative count reaches
    * `ceil(q·n)`. Output `(key, p, estimate)` (2 dp), one row per
    * requested quantile. */
  def histogramQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                         binWidth: Long, probs: Seq[Double]): DataFrame = {
    require(binWidth >= 1, s"need binWidth >= 1; got $binWidth")
    require(probs.nonEmpty && probs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]; got $probs")
    val bins = df.select(col(keyCol).as("key"),
        floor(col(valueCol).cast("double") / lit(binWidth.toDouble))
          .cast("long").as("b"))
      .filter(col("b").isNotNull)
      .groupBy(col("key"), col("b")).agg(count(lit(1)).as("cnt"))
    // the window runs on the BIN frame (≤ #bins rows per key), never rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("b"))
    val cum = bins.withColumn("cum", sum(col("cnt")).over(w))
    val tot = bins.groupBy(col("key")).agg(sum(col("cnt")).as("n"))
    cum.join(broadcast(tot), "key")
      .select(col("key"), col("b"), col("cnt"), col("cum"), col("n"),
        explode(array(probs.map(lit): _*)).as("p"))
      .withColumn("target", ceil(col("p") * col("n").cast("double")))
      .filter(col("cum") >= col("target") &&
        (col("cum") - col("cnt")) < col("target"))
      .select(col("key"), col("p"),
        round(col("b").cast("double") * binWidth +
          lit(binWidth.toDouble) *
            (col("target") - (col("cum") - col("cnt"))).cast("double") /
            col("cnt").cast("double"), 2).as("estimate"))
      .orderBy(col("key"), col("p"))
  }
}
