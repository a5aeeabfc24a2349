package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal train/test split — the leakage-safe counterpart of the hash
  * splits ([[StratifiedSplit]], [[CrossVal]]): when the model will
  * predict the FUTURE, a random split lets it train on it. The cut is a
  * rank boundary on the `(ts, tie)` total order, so the boundary is
  * deterministic even when many rows share the cut timestamp.
  *
  * Scale shape: one rank window over the pinned order (the same
  * range-shuffle any global sort pays) and a 1-row audit aggregate. The
  * audit's `no_leakage` flag re-derives the invariant (max train ts ≤ min
  * test ts) from the data rather than trusting the construction.
  */
object TemporalSplit {

  /** The input plus a `split` column (`train`/`test`): first
    * `trainFraction` of rows by `(tsCol, tieCol)` rank train.
    *
    * The rank comes from [[graft.operators.Positional.withRowIndex]] —
    * range-partitioned sort + per-partition offsets — NOT a global
    * `row_number` window, which would collapse the corpus onto one task
    * (the W1 hazard Positional exists to avoid). */
  def byTime(df: DataFrame, tsCol: String, tieCol: String,
             trainFraction: Double): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1,
      s"trainFraction out of (0,1): $trainFraction")
    val (indexed, n) = graft.operators.Positional
      .withRowIndexCounted(df, Seq(col(tsCol), col(tieCol)), "__rn")
    val cut = math.floor(n * trainFraction).toLong
    indexed
      .withColumn("split", when(col("__rn") < cut, "train").otherwise("test"))
      .drop("__rn")
  }

  /** One-row audit: counts, boundary timestamps, and the re-derived
    * leakage check. */
  def auditReport(df: DataFrame, tsCol: String, tieCol: String,
                  trainFraction: Double): DataFrame = {
    val s = byTime(df, tsCol, tieCol, trainFraction)
    s.agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
      max(when(col("split") === "train", col(tsCol))).as("train_end"),
      min(when(col("split") === "test", col(tsCol))).as("test_start"),
      (max(when(col("split") === "train", col(tsCol))) <=
        min(when(col("split") === "test", col(tsCol)))).as("no_leakage"))
  }
}
