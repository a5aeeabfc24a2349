package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-anonymity audit (Sweeney 2002): how re-identifiable is a dataset
  * under a set of quasi-identifier columns — the privacy gate a
  * training-data release runs next to the PII scrub
  * ([[graft.text.Pii]]): scrubbing direct identifiers is not enough when
  * a (type, day, value-band) combination is unique to one person.
  *
  * Report: equivalence-class count, the minimum class size (the dataset's
  * k), and how many classes / rows sit below the `k` threshold — the rows
  * a release would need to generalize or suppress.
  *
  * Scale shape: ONE hash aggregate on the quasi-identifier tuple, then a
  * 1-row rollup of the class-size frame. Nothing else touches the corpus.
  */
object Privacy {

  /** `(n_rows, n_classes, k_min, classes_below_k, rows_below_k)` for the
    * given quasi-identifier expressions. */
  def kAnonymityReport(df: DataFrame, quasiIds: Seq[Column],
                       k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier required")
    val classes = df.groupBy(quasiIds: _*).agg(count(lit(1)).as("__n"))
    classes.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("__n")).as("k_min"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("rows_below_k"))
  }
}
