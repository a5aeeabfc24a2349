package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A8/A9 — Pearson correlation matrix + upper-triangle threshold pruning
  * (`process_logs_v9.py:259-263`; thresholds 0.7 at v9, 0.9 at v8).
  *
  * The k-column correlation is ONE two-phase HashAggregate over moment
  * sums (Σx, Σx², Σxy per pair) — fully codegen'd, no RDD conversion, no
  * per-row Vector boxing (the earlier `ml.stat.Correlation` path dropped
  * to the legacy RowMatrix runtime and was ~1000× slower than the
  * equivalent SQL aggregate). Only k(k+3)/2+1 aggregate cells reach the
  * driver, so k ≲ hundreds is safe at any row count.
  *
  * Moments are summed in EXACT decimal (per-row cast, order-invariant —
  * see [[graft.SparkEntry]]'s dsum contract), then the closing Pearson
  * formula runs in deterministic double arithmetic:
  * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²)).
  * Precondition: |values| < 10^10 (DECIMAL(16,6) per-row; pairwise
  * products stay exact in DECIMAL(33,12), sums in DECIMAL(38,12)) —
  * out-of-range values FAIL LOUDLY under ANSI overflow, never silently.
  *
  * The pruning rule is the reference's exact pandas idiom: drop column j
  * if ANY earlier column i<j has |corr(i,j)| > threshold. */
object CorrPrune {

  /** Long-form upper-triangle correlation pairs (i < j by column order). */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def dec(c: String): Column = col(c).cast("decimal(16,6)")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
    val aggExprs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("__n")) ++
      cols.zipWithIndex.map { case (c, i) => sum(dec(c)).cast("double").as(s"__s$i") } ++
      cols.zipWithIndex.map { case (c, i) => sum(dec(c) * dec(c)).cast("double").as(s"__ss$i") } ++
      pairs.map { case (i, j) =>
        sum(dec(cols(i)) * dec(cols(j))).cast("double").as(s"__sp${i}_$j") }
    val m = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val n = m.getAs[Double]("__n")
    def g(name: String): Double = m.getAs[Double](name)
    val rows = pairs.map { case (i, j) =>
      val num = n * g(s"__sp${i}_$j") - g(s"__s$i") * g(s"__s$j")
      val den = math.sqrt(n * g(s"__ss$i") - g(s"__s$i") * g(s"__s$i")) *
                math.sqrt(n * g(s"__ss$j") - g(s"__s$j") * g(s"__s$j"))
      (cols(i), cols(j), num / den)
    }
    rows.toDF("col_a", "col_b", "corr")
  }

  /** Columns to drop under the reference's any-earlier-column rule. */
  def toDrop(df: DataFrame, cols: Seq[String], threshold: Double): Seq[String] = {
    val pairs = corrPairs(df, cols).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    cols.filter(c => pairs.exists { case (_, b, v) => b == c && math.abs(v) > threshold })
  }

  /** Project away pruned columns. */
  def prune(df: DataFrame, cols: Seq[String], threshold: Double): DataFrame =
    df.drop(toDrop(df, cols, threshold): _*)
}
