package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed inference/training batching: group documents of
  * similar token length, cut deterministic fixed-size batches inside each
  * bucket, and report the padding waste each row pays to its batch's
  * longest member — the batching step that keeps GPU padding overhead
  * bounded when serving or scoring a corpus.
  *
  * Scale shape: the per-bucket sequence number is the range-shuffled
  * distributed row index ([[Positional.withRowIndex]] over
  * (bucket, id)) minus the bucket's first global index — NEVER a
  * `row_number() over (partition by bucket)`: bucket cardinality is tiny
  * (tens), so a per-bucket window would sort a 100 TB corpus on a handful
  * of tasks. The bucket-base frame is |buckets| rows and broadcasts; the
  * pad window partitions by (bucket, batch), whose groups are at most
  * `batchSize` rows.
  *
  * Deterministic: batch membership is a pure function of (bucket, id
  * order) — any engine reproduces the identical assignment. */
object Batching {

  /** `(idCol, n_tokens, bucket, batch_seq, pad)` per row, where
    * `bucket = n_tokens / bucketWidth`, `batch_seq` numbers consecutive
    * `batchSize`-row batches inside the bucket in `idCol` order, and
    * `pad = max(n_tokens in batch) − n_tokens`. `sizeExpr` must be
    * long-castable. */
  def lengthBucketBatches(df: DataFrame, idCol: String, sizeExpr: Column,
                          bucketWidth: Long, batchSize: Long): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      s"bucketWidth=$bucketWidth and batchSize=$batchSize must be positive")
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric (a string id silently casts to null, making " +
        s"batch order arbitrary and the output unjoinable); got " +
        df.schema(idCol).dataType.simpleString)
    val sized = df.select(col(idCol).cast("long").as(idCol),
        sizeExpr.cast("long").as("n_tokens"))
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth).cast("long"))
    val idx = Positional.withRowIndex(sized, Seq(col("bucket"), col(idCol)), "__gidx")
    val base = idx.groupBy(col("bucket")).agg(min(col("__gidx")).as("__b0"))
    val batched = idx.join(broadcast(base), "bucket")
      .withColumn("batch_seq", ((col("__gidx") - col("__b0")) / batchSize).cast("long"))
    val w = Window.partitionBy(col("bucket"), col("batch_seq"))
    batched
      .withColumn("pad", max(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("bucket"), col("batch_seq"), col("pad"))
  }
}
