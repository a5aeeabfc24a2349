package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the star-schema testdata layout
  * (`<dir>/<table>.parquet`).
  *
  * Reads are plain `spark.read.parquet` so Catalyst's parquet source keeps
  * predicate pushdown, column pruning and partition coalescing. Never
  * caches: at 100 TB the scan must stream, and pushdown into the scan is
  * worth more than a driver-pinned cache.
  *
  * The testdata files carry TIMESTAMP(NANOS) columns (pyarrow default),
  * which Spark's vectorized parquet reader rejects. Sessions therefore set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.GraftSession]])
  * and this loader restores the declared TIMESTAMP type by converting the
  * nano longs to microsecond timestamps — a codegen'd arithmetic projection,
  * no UDF, pushdown on all other columns unaffected.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns per table (TESTDATA.md / FIXTURES.md §8 schemas). */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    val raw = spark.read.parquet(s"${dir.stripSuffix("/")}/$table.parquet")
    tsColumns.getOrElse(table, Nil).foldLeft(raw) { (df, c) =>
      // INTEGER division (`div`), never `/`: nanosecond longs exceed 2^53,
      // so the double round-trip of `/` loses up to ~128 ns and can flip
      // the truncated microsecond vs an engine that divides exactly.
      if (df.schema.fieldNames.contains(c) && df.schema(c).dataType == LongType)
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
