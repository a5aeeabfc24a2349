package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism restoration for narrow scans feeding CPU-heavy map work.
  *
  * A small single-file parquet scan arrives as one-to-few partitions (a
  * parquet row group is the minimum split unit), so every pre-shuffle
  * stage built on it — tokenization, shingle expansion, per-row scoring —
  * runs on a few cores while the rest of the machine idles. [[widen]]
  * inserts a deterministic hash repartition ONLY when the input is
  * narrower than half the session's shuffle parallelism; wide inputs (the
  * 100 TB case: thousands of row groups) pass through untouched, keeping
  * scan pushdown and zero extra exchanges in production plans.
  *
  * The repartition key must be a (near-)unique column — id-hash placement
  * is a pure function of the data (safe under stage retry and multi-branch
  * reuse), and stays uniform even when row CONTENT is heavily duplicated.
  * When the downstream operator itself shuffles on a grouping key, pass
  * that key instead: Catalyst reuses the partitioning and the widening
  * exchange REPLACES the aggregation's own, for a net zero added shuffles.
  */
object Spread {
  /** Size gate under which an input is considered narrow: anything below
    * half the session's (maxPartitionBytes × shuffle parallelism) cannot
    * have produced enough splits to use the cores. Cheap to evaluate —
    * optimizer stats on a scan are the file footer size, no RDD
    * materialization (`.rdd` would force a full physical-planning pass
    * per call, measured at ~0.2-0.3 s of driver time on small queries). */
  def widen(df: DataFrame, key: Column): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val gate = BigInt(conf.filesMaxPartitionBytes) * conf.numShufflePartitions / 2
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < gate) df.repartition(conf.numShufflePartitions, key)
    else df
  }
}
