package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * Local runs use `local[N]` but every knob is chosen as it would be on a
  * multi-executor cluster: AQE on (runtime shuffle coalescing + skew-join
  * splitting), shuffle partitions sized to cores rather than the 200
  * default, and a broadcast threshold large enough that every dimension
  * table in the star schema (region/nation/customer/supplier/part at any
  * reasonable SF) broadcasts instead of shuffling.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      // graft-native expressions/aggregates as session built-ins
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // TypedImperativeAggregate (graft_topk, drain-mine, sketches) runs
      // through ObjectHashAggregateExec, whose hash map falls back to
      // SORT-based aggregation after only 128 distinct groups per task by
      // default — a per-group bounded-heap aggregate over thousands of
      // groups would degrade to the very sort it exists to avoid. The
      // buffers are small (k-element heaps / fixed sketches), so a large
      // map is safe: fall back only at 4M groups per task.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (4 * 1024 * 1024).toString)
      // Parallelism floors for SMALL inputs; inert at scale. The default
      // 4 MB file-open cost makes a 20 MB parquet scan at most ~5 splits
      // (and AQE's 1 MB min partition size coalesces CPU-heavy shuffle
      // stages the same way), so on a 32-core node most of the machine
      // idles through stages whose work-per-byte is high (shingle
      // expansion, wedge counting, array merges). 256 KB floors let tiny
      // stages use the cores; at 100 TB every split/partition is far
      // above either floor, so production plans are untouched.
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", (256L * 1024).toString)
      // testdata parquet has shipped both TIMESTAMP(NANOS) (read as long,
      // converted in graft.sources.Tables) and timestamp[us] without
      // timezone. Disable NTZ inference so the latter reads as plain
      // TIMESTAMP under the pinned UTC session; Tables.normalizeTs handles
      // whatever type still arrives.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }

  def get(appName: String = "graft"): SparkSession = builder(appName).getOrCreate()
}
