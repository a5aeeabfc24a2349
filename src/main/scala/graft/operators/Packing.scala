package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.LongType

/** Training-sequence packing: lay documents end-to-end in a fixed total
  * order and cut fixed-token-budget sequences — the pre-tokenization
  * "pack to 4k/8k context windows" step of an LLM training pipeline.
  * Each document gets its global token offset; `seq_id = offset / L`
  * and `seq_offset = offset % L` say exactly which training sequence
  * it lands in and where (documents straddling a boundary continue into
  * the next sequence, the standard concat-then-chunk formulation).
  *
  * The core is a distributed EXCLUSIVE PREFIX SUM over the doc order —
  * same shape as [[Positional.withRowIndex]]: `repartitionByRange` for a
  * total order, one lightweight pass for per-partition token sums
  * (collected: one long per partition), then a map with broadcast
  * offsets. A window `sum() over (order by id)` without partition keys
  * would collapse 100 TB onto one task; this never concentrates more
  * than a partition.
  *
  * Deterministic: output is a pure function of (doc order, token
  * counts) — any engine reproduces the identical packing, which is what
  * makes shard-parallel tokenizer workers downstream consistent.
  */
object Packing {

  /** `(idCol, n_tokens, global_offset, seq_id, seq_offset)` per document,
    * ordered by `idCol`. `tokCol` must be castable to long. */
  def packSequential(df: DataFrame, idCol: String, tokCol: String,
                     targetLen: Long): DataFrame = {
    require(targetLen > 0, s"targetLen must be positive, got $targetLen")
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric (a string id silently casts to null and the " +
        s"offset pass then NPEs); got ${df.schema(idCol).dataType.simpleString}")
    val spark = df.sparkSession
    val sorted = df
      .select(col(idCol).cast("long").as(idCol),
        // a null/negative token count would silently corrupt every
        // downstream offset (the running sum decreases); fail the row
        // set loudly instead
        coalesce(col(tokCol).cast("long"), lit(-1L)).as("n_tokens"))
      .repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
    // one narrow pass for per-partition sums; reused by the offset pass,
    // so pin the sorted frame (the range shuffle runs once)
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = sorted.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val exclusive = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(exclusive)
    val schema = new org.apache.spark.sql.types.StructType()
      .add(idCol, LongType, nullable = false)
      .add("n_tokens", LongType, nullable = false)
      .add("global_offset", LongType, nullable = false)
      .add("seq_id", LongType, nullable = false)
      .add("seq_offset", LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r =>
        val t = r.getLong(1)
        require(t >= 0, s"null/negative token count for id ${r.getLong(0)}")
        val start = run
        run += t
        Row(r.getLong(0), t, start, start / targetLen, start % targetLen)
      }
    }
    spark.createDataFrame(out, schema)
    // `sorted` stays pinned while the result is alive (two longs per row;
    // MEMORY_AND_DISK evicts under pressure) — unpersisting before the
    // caller's action would recompute the range shuffle per pass
  }
}
