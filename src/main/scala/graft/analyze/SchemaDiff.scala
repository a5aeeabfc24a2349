package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema drift detection between two frames/snapshots — the structural
  * sibling of [[SnapshotDiff]] (which diffs rows) and the PSI/TV drift
  * family (which diffs distributions): upstream added a column, dropped
  * one, or silently widened a type. Run before a scheduled pipeline
  * consumes a new snapshot; a `type_changed` row is the early warning
  * that a downstream cast is about to go permissive ([[Expectations]]
  * then quantifies the damage).
  *
  * Pure metadata — O(columns), no data touched. Nested structs compare
  * by their full DDL string (a nested field change reports as a
  * type_changed on the top-level column; drill with the DDL in the
  * report).
  */
object SchemaDiff {

  /** `(column, change, from_type, to_type)`, change ∈
    * {added, dropped, type_changed}; empty when schemas match. */
  def diff(spark: SparkSession, old: StructType, cur: StructType): DataFrame = {
    import spark.implicits._
    val o = old.fields.map(f => f.name -> f.dataType.sql).toMap
    val c = cur.fields.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      c.keySet.diff(o.keySet).toSeq.sorted.map(n =>
        (n, "added", null: String, c(n))) ++
      o.keySet.diff(c.keySet).toSeq.sorted.map(n =>
        (n, "dropped", o(n), null: String)) ++
      o.keySet.intersect(c.keySet).toSeq.sorted
        .filter(n => o(n) != c(n))
        .map(n => (n, "type_changed", o(n), c(n)))
    rows.toDF("column", "change", "from_type", "to_type")
      .orderBy($"change", $"column")
  }

  def diff(old: DataFrame, cur: DataFrame): DataFrame =
    diff(old.sparkSession, old.schema, cur.schema)
}
