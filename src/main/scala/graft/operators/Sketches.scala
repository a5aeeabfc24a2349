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
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16; got $p")
    val m = 1 << p
    val wBits = 60 - p
    val maxRho = wBits + 1
    val alphaM =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709 else if (m == 32) 0.697 else 0.673
    val aNum = alphaM * m * m * math.pow(2.0, maxRho) // α·m²·SCALE, one double
    val hv = conv(substring(md5(col("v0").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val pos = instr(lpad(bin(shiftright(col("h"), p)), wBits, "0"), "1")
    val regs = df.select(col(keyCol).as("key"), col(valueCol).as("v0"))
      .filter(col("v0").isNotNull)
      .select(col("key"), hv.as("h"))
      .select(col("key"), col("h").bitwiseAND(lit((m - 1).toLong)).as("idx"),
        when(pos === 0, lit(maxRho)).otherwise(pos).cast("long").as("rho"))
      .groupBy(col("key"), col("idx")).agg(max(col("rho")).as("v"))
    val folded = regs.groupBy(col("key")).agg(
      count(lit(1)).as("nset"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxRho - v AS INT))")).as("ip"))
    val iCol = col("ip") + (lit(m.toLong) - col("nset")) * lit(1L << maxRho)
    val raw = lit(aNum) / iCol.cast("double")
    val zerosD = (lit(m.toLong) - col("nset")).cast("double")
    val est = when(raw <= lit(2.5 * m) && col("nset") < m,
      lit(m.toDouble) * log(lit(m.toDouble) / zerosD)).otherwise(raw)
    folded.select(col("key"), col("nset").as("registers_set"),
        round(est, 1).as("approx_distinct"))
      .orderBy(col("key"))
  }
}
