package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration by Pool-Adjacent-
  * Violators — the non-parametric step that turns a reliability table
  * ([[Evaluation.calibrationReport]]) into a usable calibration MAP
  * (Zadrozny & Elkan 2002): binned-mean calibration can zig-zag with
  * sampling noise; PAV pools adjacent bins until the empirical rate is
  * monotone in the score, which is the weighted-least-squares-optimal
  * monotone fit.
  *
  * Scale shape: the corpus-sized work is ONE (bin)-keyed count/sum
  * aggregate (bins = scores rounded to `binScale` dp, so the bin count
  * is bounded by 10^binScale + 1, NOT by corpus size); the PAV merge
  * loop runs on the driver over that bounded bin table — the same
  * documented-bounded-finisher pattern as k-core's peel tail. PAV
  * itself is inherently sequential (each pool can cascade backwards),
  * so a distributed formulation buys nothing at ≤ 10k bins.
  *
  * Determinism: pooled rates are exact integer ratios (Σpos/Σn) turned
  * to double once per block; no float accumulates across the merge.
  */
object Isotonic {

  /** PAV over (weight, positives) blocks: returns the pooled rate for
    * each input index. Exposed for the spec's brute-force comparison. */
  private[graft] def pav(ns: Array[Long], pos: Array[Long]): Array[Double] = {
    // stack of (n, pos, span) blocks; merge while the left block's rate
    // exceeds the right's (strict violation — ties stay separate blocks)
    val bn = new Array[Long](ns.length)
    val bp = new Array[Long](ns.length)
    val span = new Array[Int](ns.length)
    var top = -1
    for (i <- ns.indices) {
      top += 1; bn(top) = ns(i); bp(top) = pos(i); span(top) = 1
      while (top > 0 &&
        bp(top - 1) * bn(top) > bp(top) * bn(top - 1)) { // r(top-1) > r(top)
        bn(top - 1) += bn(top); bp(top - 1) += bp(top)
        span(top - 1) += span(top); top -= 1
      }
    }
    val out = new Array[Double](ns.length)
    var i = 0
    for (b <- 0 to top) {
      val r = bp(b).toDouble / bn(b)
      for (_ <- 0 until span(b)) { out(i) = r; i += 1 }
    }
    out
  }

  /** Isotonic calibration table for a score against a boolean outcome:
    * `(bin_score, n, pos, rate, iso_rate)` ordered by bin, where
    * `iso_rate` is the PAV-pooled monotone rate. `binScale` = decimal
    * places the score is rounded to for binning (bin count is bounded by
    * the score range at that scale — document ≤ ~10^binScale bins). */
  def calibrate(df: DataFrame, scoreCol: Column, labelCol: Column,
                binScale: Int = 3, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val bins = df
      .select(round(scoreCol, binScale).as("bin_score"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("bin_score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .orderBy(col("bin_score"))
      .collect() // bounded: ≤ 10^binScale + 1 bins by construction
    val ns = bins.map(_.getAs[Long]("n"))
    val pos = bins.map(_.getAs[Long]("pos"))
    val iso = pav(ns, pos)
    val rows = bins.zipWithIndex.map { case (r, i) =>
      val n = ns(i); val p = pos(i)
      (r.getAs[Double]("bin_score"), n, p,
        BigDecimal(p.toDouble / n).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(iso(i)).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toSeq.toDF("bin_score", "n", "pos", "rate", "iso_rate")
      .orderBy(col("bin_score"))
  }
}
