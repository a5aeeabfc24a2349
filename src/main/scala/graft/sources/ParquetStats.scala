package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Parquet footer statistics as data: per-file, per-column row counts and
  * min/max zone-map bounds read from the METADATA ONLY — the information
  * the engine's own scan pruning runs on, surfaced so layout decisions
  * ([[Sinks.writeZOrdered]], [[Sinks.compact]]) can be AUDITED: are the
  * per-file ranges actually tight after the sort, which files would a
  * given predicate skip, is a compaction overdue.
  *
  * Footers are kilobytes regardless of data size; reading them for a
  * 100 TB table costs one small ranged read per file and never touches
  * row groups (this is exactly what the scan planner itself does).
  * Driver-side loop, deliberately: file counts are bounded by layout
  * hygiene (that is what [[Sinks.compact]] is for), and the parquet
  * footer API is not serializable-task-friendly. */
object ParquetStats {

  /** `(file, row_group, column, n_rows, min_val, max_val)` with bounds
    * rendered as strings (typed bounds vary per column). */
  def footerStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = new Configuration()
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.isFile).sortBy(_.getName)
    val rows = files.flatMap { f =>
      val in = HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf)
      val reader = ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.zipWithIndex.flatMap {
          case (block, gi) =>
            block.getColumns.asScala.map { cc =>
              val st = cc.getStatistics
              val (mn, mx) =
                if (st == null || !st.hasNonNullValue) (null: String, null: String)
                else (String.valueOf(st.genericGetMin),
                  String.valueOf(st.genericGetMax))
              (f.getName, gi.toLong, cc.getPath.toDotString,
                block.getRowCount, mn, mx)
            }
        }
      } finally reader.close()
    }
    rows.toSeq.toDF("file", "row_group", "column", "n_rows", "min_val", "max_val")
  }

  /** How many files a `col BETWEEN lo AND hi` predicate would skip,
    * judged from the footers alone: `(n_files, n_skippable)`. */
  def pruningEstimate(spark: SparkSession, dir: String, column: String,
                      lo: Long, hi: Long): (Long, Long) = {
    val stats = footerStats(spark, dir)
      .filter(org.apache.spark.sql.functions.col("column") === column)
      .collect()
    val byFile = stats.groupBy(_.getString(0))
    val skippable = byFile.count { case (_, rs) =>
      rs.forall { r =>
        val mn = Option(r.getString(4)).map(_.toLong)
        val mx = Option(r.getString(5)).map(_.toLong)
        mn.exists(_ > hi) || mx.exists(_ < lo)
      }
    }
    (byFile.size.toLong, skippable.toLong)
  }
}
