package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-order operators: the step between a curated
  * corpus and a trainer's data loader. A training run needs (a) a
  * GLOBAL shuffle of the corpus that is reproducible per epoch (same
  * seed ⇒ same order on any engine, any partitioning) and (b)
  * per-group subsampling that is a pure function of the data, so a
  * resumed or re-run export selects identical rows.
  *
  * Both ride the portable md5-derived hash ([[Sharding.hash32]]) — an
  * engine-independent contract, unlike Spark's seeded Murmur3 or
  * `rand()`. The reference's train/test split is sklearn's seeded
  * permutation (`process_logs_v10.py:152-158`) — same reproducibility
  * contract, engine-portable form.
  *
  * Scale shape:
  *  - [[epochShuffle]]: one range shuffle on the hash (the distributed
  *    row-index path — never a single-task global window);
  *  - [[samplePerGroup]]: one hash shuffle on the group key; the rank
  *    window spills, so a giant group never builds driver or
  *    aggregation-buffer state.
  */
object TrainOrder {

  /** Epoch-seeded portable shuffle hash of a key. */
  def epochHash(key: Column, epoch: Int): Column =
    md5(concat_ws(":", lit(epoch), key.cast("string")))

  /** Assign each row its global position in the epoch's shuffled order:
    * order by `(md5(epoch:key), key)` — uniform, deterministic, and
    * different each epoch. Returns the input plus `pos` (0-based). */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int,
                   posName: String = "pos"): DataFrame =
    Positional.withRowIndex(
      df.withColumn("__eh", epochHash(col(keyCol), epoch)),
      Seq(col("__eh"), col(keyCol)), posName)
      .drop("__eh")

  /** Keep `k` rows per group, selected by ascending portable hash — a
    * deterministic engine-portable reservoir (every engine recomputes
    * the same winners from the data alone). Returns the input rows that
    * survive, plus their `smp_rank` (1-based within the group). */
  def samplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(epochHash(col(keyCol), 0), col(keyCol))
    df.withColumn("smp_rank", row_number().over(w))
      .filter(col("smp_rank") <= k)
  }

  /** WEIGHTED sample without replacement, k per group (Efraimidis &
    * Spirakis 2006, algorithm A-ES): rank by `u^(1/w)` descending, where
    * `u` is the portable uniform from the row's key hash — each row's
    * inclusion probability is proportional to its weight, and the draw
    * is a pure function of the data (any engine reproduces the winners).
    * The quality-weighted subcorpus selector: weight = quality score ⇒
    * better documents proportionally likelier, none guaranteed, all
    * possible. Non-positive weights never win (key −∞). One key shuffle;
    * the rank window spills. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
                             weightCol: String, k: Int): DataFrame = {
    // u in (0,1]: (hash32 + 1) / 2^32 — hash32's zero must not produce
    // u = 0 (pow(0, x) = 0 ties every zero-hash row at the bottom)
    val u = (Sharding.hash32(col(keyCol)) + 1).cast("double") / 4294967296.0
    val esKey = when(col(weightCol) > 0, pow(u, lit(1.0) / col(weightCol)))
      .otherwise(lit(Double.NegativeInfinity))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(esKey.desc, col(keyCol))
    df.withColumn("smp_rank", row_number().over(w))
      .filter(col("smp_rank") <= k && col(weightCol) > 0)
  }
}
