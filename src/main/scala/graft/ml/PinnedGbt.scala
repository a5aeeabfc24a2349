package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gradient-boosted STUMPS by pinned-integer squared-loss boosting — the
  * oracle-exact sibling of [[Models.fitGbt]] for INTEGER feature tables,
  * the [[PinnedLogit]]/PinnedPca pattern applied to the boosting family
  * (reference: `process_logs_v10.py` trains the sklearn ensemble on the
  * same windowed count features; this variant trades its RNG-dependent
  * trees for a deterministic recurrence both engines can replay):
  *
  *  - predictions live on the 1e-12 long grid (`p12`); residuals
  *    `r12 = y·1e12 − p12` are EXACT long arithmetic;
  *  - per round, every (feature, threshold) stump candidate is scored by
  *    the weighted variance-reduction gain `SL²/WL + SR²/WR − S²/W`
  *    where `SL = Σ_left w·r12` (exact BigInt sums, one IEEE-double
  *    conversion at the comparison — both engines divide the SAME exact
  *    integers, so the doubles are bit-identical);
  *  - argmax tie-breaks (gain DESC, feature ASC, threshold ASC); leaf
  *    deltas `round(lr·S/W)` pin straight back to the grid, and the
  *    round's gain pins to a 1e-12 long for the importance rollup.
  *
  * The fit is driver-side over the weighted DISTINCT rows (bounded by
  * the integer feature-space cardinality, the [[Models.compressWeighted]]
  * precedent — per-round cost independent of corpus size); the one
  * corpus-sized pass is the compressing aggregation itself. Thresholds
  * are each feature's distinct values minus its maximum (a split at the
  * maximum has an empty right side). Importance is each feature's share
  * of total pinned gain — an unrolled SQL twin away from a hash match.
  */
object PinnedGbt {

  /** DuckDB-`round()` rounding: half away from zero. */
  private def ra(x: Double): Long =
    if (x >= 0) math.round(x) else -math.round(-x)

  /** One fitted stump: 0-based feature index, `x ≤ threshold` goes left,
    * grid leaf deltas, and the round's 1e-12-pinned gain. */
  case class Stump(feature: Int, threshold: Long, vl12: Long, vr12: Long,
                   gain12: Long)

  /** Fixed-count boosting fit from the weighted distinct rows. Feature
    * and label columns must be integral. */
  def fitStumps(feats: DataFrame, featureCols: Seq[String], labelCol: String,
                iters: Int = 10, lr: Double = 0.3): Seq[Stump] = {
    require(iters >= 1 && lr > 0, s"need iters >= 1, lr > 0: $iters, $lr")
    val k = featureCols.size
    val rows = feats
      .groupBy((featureCols :+ labelCol).map(c => col(c).cast("long")): _*)
      .agg(count(lit(1)).as("w")).collect()
      .map { r =>
        (Array.tabulate(k)(j => r.getLong(j)), r.getLong(k), r.getLong(k + 1))
      }
    val n = rows.map(_._3).sum
    require(n >= 1, "empty feature table")
    // base score: grid-pinned weighted label mean (the SQL twin's p0)
    val swy = rows.map { case (_, y, w) => y * w }.sum
    val p0 = ra(1e12 * swy.toDouble / n.toDouble)
    val p12 = Array.fill(rows.length)(p0)
    // candidate thresholds: distinct values per feature minus the max,
    // ascending — the twin's `th` CTE
    val thresholds = Array.tabulate(k) { j =>
      val vs = rows.map(_._1(j)).distinct.sorted
      vs.dropRight(1)
    }
    val out = Seq.newBuilder[Stump]
    var it = 0
    while (it < iters) {
      var best: Stump = null
      var bestGain = Double.NegativeInfinity
      var s = BigInt(0)
      var i = 0
      while (i < rows.length) {
        s += BigInt(rows(i)._3) * BigInt(rows(i)._2 * 1000000000000L - p12(i))
        i += 1
      }
      var f = 0
      while (f < k) {
        thresholds(f).foreach { t =>
          var sl = BigInt(0); var wl = 0L
          var i2 = 0
          while (i2 < rows.length) {
            val (x, y, w) = rows(i2)
            if (x(f) <= t) {
              sl += BigInt(w) * BigInt(y * 1000000000000L - p12(i2))
              wl += w
            }
            i2 += 1
          }
          val wr = n - wl
          if (wl > 0 && wr > 0) {
            val sr = s - sl
            // the twin's gain expression, double-for-double:
            // CAST(sl AS DOUBLE)*sl/wl + CAST(sr AS DOUBLE)*sr/wr
            //   - CAST(s AS DOUBLE)*s/wt
            val gain = sl.toDouble * sl.toDouble / wl.toDouble +
              sr.toDouble * sr.toDouble / wr.toDouble -
              s.toDouble * s.toDouble / n.toDouble
            // strict > with (f, t) ascending enumeration ==
            // ORDER BY gain DESC, f, t LIMIT 1
            if (gain > bestGain) {
              bestGain = gain
              best = Stump(f, t,
                ra(lr * sl.toDouble / wl.toDouble),
                ra(lr * sr.toDouble / wr.toDouble),
                ra(gain / 1e12))
            }
          }
        }
        f += 1
      }
      // a degenerate round (single distinct value on every feature, or
      // constant residuals everywhere) contributes nothing further and
      // every later round repeats it — stop, matching a twin whose
      // candidate CTE went empty
      if (best == null) { it = iters }
      else {
        out += best
        var i3 = 0
        while (i3 < rows.length) {
          val x = rows(i3)._1
          p12(i3) += (if (x(best.feature) <= best.threshold) best.vl12
                      else best.vr12)
          i3 += 1
        }
        it += 1
      }
    }
    out.result()
  }

  /** `(feature, importance)` — each feature's share of total pinned gain
    * (the [[Models.gbtImportance]] contract: descending, name-tied). The
    * closing division and 6-dp round run in Spark SQL so the twin's
    * `round(CAST(gf AS DOUBLE) / gt, 6)` matches operation for
    * operation. */
  def importanceReport(feats: DataFrame, featureCols: Seq[String],
                       labelCol: String, iters: Int = 10,
                       lr: Double = 0.3): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val stumps = fitStumps(feats, featureCols, labelCol, iters, lr)
    val byF = stumps.groupBy(_.feature)
      .map { case (f, ss) => f -> ss.map(s => BigInt(s.gain12)).sum }
    val tot = byF.values.sum
    featureCols.zipWithIndex
      .map { case (c, j) =>
        (c, byF.getOrElse(j, BigInt(0)).toDouble, tot.toDouble)
      }
      .toDF("feature", "gf", "gt")
      .select(col("feature"),
        when(col("gt") > 0d, round(col("gf") / col("gt"), 6))
          .otherwise(lit(0.0)).as("importance"))
      .orderBy(desc("importance"), asc("feature"))
  }
}
