package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard assignment for training-data export: the last
  * pipeline stage before a corpus ships to a trainer, which needs (a) a
  * STABLE doc → shard mapping (resumable exports, reproducible runs,
  * engine-independent audits) and (b) shards of statistically even size
  * regardless of key skew.
  *
  * The shard key is the first 8 hex digits of `md5(key)` mod `nShards` —
  * a PORTABLE hash: any engine (Spark, DuckDB, Python, a trainer's data
  * loader) recomputes the identical assignment from the key alone.
  * Spark's internal `hash()` is Murmur3-with-Spark-seed: ideal inside a
  * shuffle, wrong as an export contract another system must reproduce.
  *
  * Scale shape: the assignment is a stateless projection (codegen'd md5 +
  * conv); the manifest is one partial-merged aggregate on the shard id —
  * `nShards` groups, so the reduce side is trivially small. Writing the
  * actual files would be `df.write.partitionBy("shard")` — the manifest
  * is the queryable contract of that layout.
  *
  * Reference behavior: the reference's train/test export writes one CSV
  * per split (process_logs_v10.py:160-183); this is the same export
  * contract at fleet scale.
  */
object Sharding {

  /** Portable 32-bit hash: first 8 hex digits of md5(key) as a long in
    * [0, 2^32) — the shared primitive behind shard ids and
    * [[Mixture.unitHash]] deterministic sampling. */
  def hash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Portable deterministic shard id in [0, nShards) from any key column. */
  def shardId(key: Column, nShards: Int): Column =
    hash32(key) % nShards

  /** The input plus a `shard` column. */
  def withShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardId(col(keyCol), nShards))

  /** Per-shard export manifest: doc count, payload bytes, and the key
    * range (min/max) each shard covers — the audit surface a trainer
    * checks before consuming the export. */
  def manifest(df: DataFrame, keyCol: String, payloadCol: String,
               nShards: Int): DataFrame =
    withShard(df, keyCol, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
           sum(length(col(payloadCol)).cast("long")).as("n_bytes"),
           min(col(keyCol)).as("min_key"),
           max(col(keyCol)).as("max_key"))
}
