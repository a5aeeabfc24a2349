package graft.analyze

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** A8/A9 — Pearson correlation matrix + upper-triangle threshold pruning
  * (`process_logs_v9.py:259-263`; thresholds 0.7 at v9, 0.9 at v8).
  *
  * The k×k correlation is computed DISTRIBUTED in one pass
  * (`ml.stat.Correlation` over an assembled vector column — a single
  * aggregate of the Gram matrix); only the k×k result lands on the
  * driver, so k ≲ thousands is safe at any row count. The pruning rule is
  * the reference's exact pandas idiom: drop column j if ANY earlier column
  * i<j has |corr(i,j)| > threshold. */
object CorrPrune {

  /** Long-form upper-triangle correlation pairs (i < j by column order). */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("__features")
      .transform(df.select(cols.map(col): _*))
    val Row(m: Matrix) = Correlation.corr(assembled, "__features").head()
    val rows = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j), m(i, j))
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
