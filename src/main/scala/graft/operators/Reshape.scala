package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long reshaping. The reference pivots long-form event counts into a
  * wide matrix (`process_logs_v10.py` event-matrix pivot, SURVEY.md §2 A6/J2);
  * [[melt]] is the inverse — unpivot a set of measure columns into
  * `(variable, value)` long form, the layout every downstream aggregate,
  * profile and drift operator here consumes.
  *
  * Scale shape: `unpivot` is a flatMap-style projection — no shuffle, no
  * driver state, output = rows × measures. The long form is the
  * scale-correct primary representation (SURVEY.md §7.4 #3): a thousand
  * measure columns melt into a thousand-row-per-record stream instead of a
  * thousand-column schema wall.
  */
object Reshape {

  /** Unpivot `valueCols` (all coerced to double) into `(variable, value)`,
    * keeping `idCols`. Pure projection; Catalyst prunes unreferenced
    * measures out of the scan when downstream selects a subset. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           variableName: String = "variable",
           valueName: String = "value"): DataFrame =
    df.unpivot(
      idCols.map(col).toArray,
      valueCols.map(c => col(c).cast("double")).toArray,
      variableName, valueName)

  /** Per-measure summary over the melted frame: n / exact 6-dp sum
    * ([[ExactAgg]] portable split-sum) / min / max. One hash aggregate
    * over the projection — the whole reshape+profile runs in a single
    * stage with no wide shuffle (the final agg keys on the measure name,
    * cardinality = |valueCols|). */
  def meltSummary(df: DataFrame, idCols: Seq[String],
                  valueCols: Seq[String], scale: Int = 2): DataFrame =
    melt(df, idCols, valueCols, "metric", "val")
      .groupBy(col("metric"))
      .agg(
        count(lit(1)).as("n"),
        ExactAgg.dsum(col("val"), scale).as("total"),
        min(col("val")).as("vmin"),
        max(col("val")).as("vmax"))
      .orderBy(col("metric"))
}
