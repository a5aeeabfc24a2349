package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Logistic regression by PINNED-LONG fixed-count gradient descent —
  * the oracle-exact sibling of [[Models.fitLogisticRegression]] for
  * INTEGER feature tables (event-count windows and the like), where the
  * whole fit is an exact integer recurrence:
  *
  *  - the margin `z = β₀ + Σ βⱼxⱼ` is EXACT long arithmetic (β on the
  *    1e-12 grid, x small integers — no rounding at all);
  *  - the only transcendental, the per-row sigmoid, pins to a 1e-9
  *    long immediately (the one place a libm ulp could differ between
  *    engines, absorbed by the grid);
  *  - the weighted gradient `Σ w·(y − p)·x` is exact integer
  *    arithmetic over the weighted DISTINCT rows (driver-collected:
  *    bounded by the integer feature-space cardinality, the
  *    [[Models.compressWeighted]] precedent — identical likelihood,
  *    fit cost independent of corpus size), and the step
  *    `β += lr·g·10³/n` pins back to the grid.
  *
  * Classification needs no sigmoid at all (`z > 0 ⇔ p > ½` exactly),
  * so the metrics layer is pure integer arithmetic: confusion counts,
  * and the tie-corrected rank AUC carried as the exact integer
  * `Σ npos·(2·cumBefore + n + 1)` (doubled midranks) with one closing
  * double division — the whole query is an unrolled SQL twin away from
  * a hash match, the q97/q35 pattern applied to a classifier. */
object PinnedLogit {

  private def ra(x: Double): Long =
    if (x >= 0) math.round(x) else -math.round(-x)

  /** 1e-12-grid coefficients (intercept first) after `iters` full-batch
    * GD steps from β = 0. Feature and label columns must be integral. */
  def fitBeta(feats: DataFrame, featureCols: Seq[String], labelCol: String,
              iters: Int = 100, lr: Double = 0.5): Array[Long] = {
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
    val b = Array.fill(k + 1)(0L)
    var it = 0
    while (it < iters) {
      val g = Array.fill(k + 1)(BigInt(0))
      rows.foreach { case (x, y, w) =>
        var z12 = b(0)
        var j = 0
        while (j < k) { z12 += b(j + 1) * x(j); j += 1 }
        val p9 = ra(1e9 / (1.0 + math.exp(-(z12.toDouble / 1e12))))
        val resid = BigInt((y * 1000000000L) - p9) * w
        g(0) += resid
        j = 0
        while (j < k) { g(j + 1) += resid * BigInt(x(j)); j += 1 }
      }
      var j = 0
      while (j <= k) {
        b(j) += ra(lr * g(j).toDouble * 1e3 / n)
        j += 1
      }
      it += 1
    }
    b
  }

  /** L7/L8 importance ranking from the pinned fit: `(feature,
    * importance)` with importance = |coefficient| (exact grid value over
    * 1e12), ordered descending then by feature name. */
  def importanceReport(feats: DataFrame, featureCols: Seq[String],
                       labelCol: String, iters: Int = 100,
                       lr: Double = 0.5): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val b = fitBeta(feats, featureCols, labelCol, iters, lr)
    featureCols.zipWithIndex
      .map { case (c, j) => (c, math.abs(b(j + 1))) }
      .toDF("feature", "i12")
      .select(col("feature"), (col("i12").cast("double") / 1e12).as("importance"))
      .orderBy(desc("importance"), asc("feature"))
  }

  /** `(metric, value)` rows — precision / recall / accuracy / auc of the
    * fitted model scored over the FULL feature table (prediction by the
    * exact integer margin sign; AUC by doubled-midrank integers on the
    * margin — sigmoid-monotone, so rank-identical to probability).
    * AUC is NULL when the labels are single-class (the L6 guard). */
  def metricsReport(feats: DataFrame, featureCols: Seq[String],
                    labelCol: String, iters: Int = 100,
                    lr: Double = 0.5): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val b = fitBeta(feats, featureCols, labelCol, iters, lr)
    val z12: Column = featureCols.zipWithIndex.foldLeft(lit(b(0))) {
      case (acc, (c, j)) => acc + lit(b(j + 1)) * col(c).cast("long")
    }
    val scored = feats
      .select(col(labelCol).cast("long").as("y"), z12.as("z12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cts = scored.agg(
      sum(when(col("y") === 1L && col("z12") > 0L, 1L).otherwise(0L)).as("tp"),
      sum(when(col("y") === 0L && col("z12") > 0L, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") === 1L && col("z12") <= 0L, 1L).otherwise(0L)).as("fn"),
      count(lit(1)).as("n"),
      sum(when((col("y") === 1L) === (col("z12") > 0L), 1L).otherwise(0L)).as("correct"))
      .head()
    val (tp, fp, fn, n, correct) =
      (cts.getLong(0), cts.getLong(1), cts.getLong(2), cts.getLong(3), cts.getLong(4))
    // doubled-midrank AUC as exact integers: distinct margins are bounded
    // by the distinct feature rows, so the single-partition rank window
    // is driver-bounded by construction
    val grouped = scored.groupBy(col("z12"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("npos"))
    val before = Window.orderBy(col("z12")).rowsBetween(Window.unboundedPreceding, -1)
    val aucRow = grouped
      .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
      .agg(sum(col("npos") * (col("cb") * 2 + col("cnt") + 1)).as("rp2"),
        sum(col("npos")).as("np"),
        sum(col("cnt") - col("npos")).as("nneg"))
      .head()
    scored.unpersist(blocking = false)
    val (rp2, np, nneg) = (aucRow.getLong(0), aucRow.getLong(1), aucRow.getLong(2))
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val accuracy = if (n == 0) 0.0 else correct.toDouble / n
    val auc: Option[Double] =
      if (np > 0 && nneg > 0)
        Some((rp2 - np * (np + 1)).toDouble / (2.0 * np * nneg))
      else None
    Seq(("precision", Some(precision)), ("recall", Some(recall)),
        ("accuracy", Some(accuracy)), ("auc", auc))
      .toDF("metric", "value")
  }
}
