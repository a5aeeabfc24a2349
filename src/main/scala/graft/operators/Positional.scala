package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Positional (row-index) operators — W1/W2 in SURVEY.md §2.5.
  *
  * The reference's windowing is positional, not temporal: pandas RangeIndex
  * order, `Window_ID = row_index // 5` (`process_logs_v9.py:267-271`). A
  * naive Spark translation is `row_number().over(Window.orderBy(...))` with
  * no partition key — which collapses the whole dataset onto ONE task and
  * dies at scale. Instead:
  *
  *   repartitionByRange(order) → sortWithinPartitions(order) → zipWithIndex
  *
  * Range partitioning gives a total order across partitions; zipWithIndex
  * then assigns a globally contiguous 0-based index with one lightweight
  * extra job (per-partition counts), never concentrating data on a single
  * task. This is the 100 TB-safe form of a global row number.
  */
object Positional {

  /** Append a contiguous global 0-based `idxName` column following the
    * total order given by `order` (must be a deterministic, ideally unique,
    * key list). */
  def withRowIndex(df: DataFrame, order: Seq[Column], idxName: String = "row_idx"): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idxName, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** W2: count-based tumbling window id — `windowId = rowIdx / size`
    * (`process_logs_v9.py:267`). Compose with `groupBy("window_id")` for
    * the reference's feature-sum / label-max aggregations; that groupBy is
    * a normal two-phase hash aggregate (map-side partials), so the only
    * scale-sensitive step is the range shuffle in [[withRowIndex]]. */
  def tumbling(df: DataFrame, order: Seq[Column], size: Long,
               windowCol: String = "window_id"): DataFrame = {
    import org.apache.spark.sql.functions.{col, floor, lit}
    withRowIndex(df, order, "__row_idx")
      .withColumn(windowCol, floor(col("__row_idx") / lit(size)).cast(LongType))
      .drop("__row_idx")
  }

  /** Count-based SLIDING windows: window `w` covers rows
    * `[w·step, w·step + size)`. Each row explodes into its owning windows
    * (≤ ⌈size/step⌉ of them) — the standard row-multiplication trade of
    * overlapped windows; the downstream aggregation stays a two-phase
    * hash agg. `step == size` degenerates to [[tumbling]]. Integer
    * arithmetic only (`div`), so window ids are exact at any index. */
  def sliding(df: DataFrame, order: Seq[Column], size: Long, step: Long,
              windowCol: String = "window_id"): DataFrame = {
    import org.apache.spark.sql.functions.{explode, expr, greatest, lit, sequence}
    require(size > 0 && step > 0 && step <= size,
      s"need 0 < step <= size for full coverage, got size=$size step=$step")
    withRowIndex(df, order, "__row_idx")
      .withColumn(windowCol, explode(sequence(
        greatest(lit(0L), expr(s"(__row_idx - ${size - step}) div $step")),
        expr(s"__row_idx div $step"))))
      .drop("__row_idx")
  }
}
