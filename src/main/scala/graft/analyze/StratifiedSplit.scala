package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L1/L2 — stratified splits (SURVEY.md §2.7).
  *
  * The reference uses sklearn's `train_test_split(stratify=y)`
  * (`process_logs_v9.py:337`, 60/20/20 at v9:277-279). Spark's
  * `randomSplit` is NOT stratified, so the engine composes
  * `stat.sampleBy` (per-stratum Bernoulli sampling, seed-pinned) with an
  * anti-join for the complement. One pass per split boundary; the
  * anti-join is a broadcast-friendly join on the row key.
  *
  * Exact sklearn row membership is NOT reproducible (different RNGs) —
  * the contract is the *fraction per stratum* and seed-determinism within
  * the engine (SURVEY.md §7.4 #5).
  */
object StratifiedSplit {

  /** Two-way stratified split. `keyCol` must be a unique row key (used for
    * the complement anti-join). Returns (sampled, complement). */
  def twoWay(df: DataFrame, labelCol: String, keyCol: String,
             fraction: Double, seed: Long = 42L): (DataFrame, DataFrame) = {
    val labels = df.select(col(labelCol)).distinct().collect().map(_.get(0))
    val fractions = labels.map(l => l -> fraction).toMap
    val sampled = df.stat.sampleBy(labelCol, fractions, seed)
    val complement = df.join(sampled.select(col(keyCol)), Seq(keyCol), "left_anti")
    (sampled, complement)
  }

  /** Reference's 60/20/20 train/val/test: two chained stratified splits. */
  def threeWay(df: DataFrame, labelCol: String, keyCol: String,
               trainFrac: Double = 0.6, valFrac: Double = 0.2,
               seed: Long = 42L): (DataFrame, DataFrame, DataFrame) = {
    val (train, rest) = twoWay(df, labelCol, keyCol, trainFrac, seed)
    val restValFrac = valFrac / (1.0 - trainFrac)
    val (valSet, test) = twoWay(rest, labelCol, keyCol, restValFrac, seed + 1)
    (train, valSet, test)
  }

  /** Tag each row with its split for a single-output-DataFrame surface. */
  def tagged(df: DataFrame, labelCol: String, keyCol: String,
             trainFrac: Double = 0.6, valFrac: Double = 0.2,
             seed: Long = 42L): DataFrame = {
    val (train, valSet, test) = threeWay(df, labelCol, keyCol, trainFrac, valFrac, seed)
    train.withColumn("split", lit("train"))
      .unionAll(valSet.withColumn("split", lit("val")))
      .unionAll(test.withColumn("split", lit("test")))
  }
}
