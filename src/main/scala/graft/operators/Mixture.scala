package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain mixing for training corpora: compute per-source sampling
  * weights that equalize token budgets across sources, then apply them
  * with a DETERMINISTIC Bernoulli sample — the downsample-the-giant-crawl
  * / keep-all-of-the-small-corpus step every pretraining mix runs.
  *
  * Determinism is the contract: the keep/drop decision for a document is
  * a pure function of its key (`u = md5-prefix(key) / 2^32 < weight`),
  * not of `rand()` — so reruns, retries, and other engines reproduce the
  * exact same subcorpus (same portable hash as
  * [[Sharding.shardId]]; u is a dyadic rational, exactly representable
  * in double on every engine).
  *
  * Scale shape: per-source totals are one partial-merged aggregate
  * (|sources| rows); weights BROADCAST back onto the corpus, so the
  * sample itself is a map-side filter — the 100 TB table is scanned
  * once and never shuffled.
  */
object Mixture {

  /** Uniform [0, 1) from a key via the portable md5-prefix hash. */
  def unitHash(key: Column): Column =
    Sharding.hash32(key) / lit(4294967296.0)

  /** Per-group totals and the capped equal-budget weight
    * `min(1, (total/n_groups) / group_total)`. */
  def budgetWeights(df: DataFrame, groupCol: String, sizeCol: String): DataFrame = {
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(sizeCol).cast("long")).as("group_size"))
    val budget = totals.agg(
      (sum(col("group_size")).cast("double") / count(lit(1))).as("budget"))
    totals.join(broadcast(budget))
      .withColumn("weight",
        least(lit(1.0), col("budget") / col("group_size")))
      .select(col(groupCol), col("group_size"), col("weight"))
  }

  /** The rows kept by the deterministic sample (all input columns plus
    * the group's `weight`). */
  def sampleToBudget(df: DataFrame, groupCol: String, sizeCol: String,
                     keyCol: String): DataFrame =
    df.join(broadcast(budgetWeights(df, groupCol, sizeCol)
        .select(col(groupCol), col("weight"))), groupCol)
      .filter(unitHash(col(keyCol)) < col("weight"))
}
