package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.mine.EventTemplate

/** Sinks — S4/S5 in SURVEY.md §2.1.
  *
  *  - S4: header CSV of a result table. `single = true` mirrors the
  *    reference's one-file `to_csv` (`process_logs_v10.py:160`) via
  *    `coalesce(1)` — correct for small summaries (cluster tables), never
  *    for data-sized outputs, where the default many-part write stands.
  *  - S5: mining state persisted as a plain parquet `Dataset[EventTemplate]`
  *    — the engine-native, schema-full replacement for the reference's
  *    opaque `drain3_state.bin` blob: resumable (restore + continue
  *    mining), queryable, and versionable by path.
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String, single: Boolean = true): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  def saveTemplates(templates: Dataset[EventTemplate], path: String): Unit =
    templates.write.mode("overwrite").parquet(path)

  def loadTemplates(spark: SparkSession, path: String): Dataset[EventTemplate] = {
    import spark.implicits._
    spark.read.parquet(path).as[EventTemplate]
  }
}
