package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Mixture, Positional}

/** L1/L2 — stratified splits (SURVEY.md §2.7), PORTABLE: membership is a
  * pure function of the data, never of an engine RNG.
  *
  * The reference uses sklearn's `train_test_split(stratify=y)`
  * (`process_logs_v9.py:337`, 60/20/20 at v9:277-279) — seeded, with
  * EXACT per-stratum counts. Spark's `stat.sampleBy` (the previous
  * implementation here) is per-stratum Bernoulli: counts are only
  * approximate, and the seeded RNG is engine-private, so a resumed
  * export or a rerun on another engine selects different rows. Here each
  * row ranks within its label by the portable md5 unit hash
  * ([[Mixture.unitHash]] — the same keep-rule contract as
  * `sampleToBudget` and `TrainOrder.epochShuffle`), and the first
  * `floor(n·frac + 0.5)` rows of each label fill the first split:
  * sklearn's exact-stratification semantic AND byte-identical membership
  * at any core count, on any engine, on any rerun — which is what makes
  * the split SQL-oracle-able (q31).
  *
  * Scale shape: the per-label rank is a distributed range-shuffled row
  * index over `(label, u, key)` ([[Positional.withRowIndex]] — no
  * per-label single-task window); per-label offsets/counts are one
  * |labels|-row aggregate broadcast back with a null-safe join (a null
  * label is a legal stratum).
  */
object StratifiedSplit {

  /** Tag each row `train` / `val` / `test`: within each label, hash rank
    * ≤ `floor(n·trainFrac + 0.5)` → train, ≤ `floor(n·(trainFrac +
    * valFrac) + 0.5)` → val, else test. `keyCol` must be a unique row
    * key (the hash input and the deterministic tie-break). */
  def tagged(df: DataFrame, labelCol: String, keyCol: String,
             trainFrac: Double = 0.6, valFrac: Double = 0.2): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"need trainFrac > 0, valFrac >= 0, sum <= 1; got $trainFrac, $valFrac")
    val cut2 = trainFrac + valFrac
    // EAGER checkpoint: the range shuffle + zipWithIndex job below is the
    // split's dominant cost and idx feeds TWO consumers (the offs
    // aggregate and the main join side) — unmaterialized, deterministic
    // hashing keeps the double-run correct but the expensive pass runs
    // twice. Materializing once here means both consumers read the
    // cached blocks ("one pass, one rank" as advertised); the blocks are
    // reclaimed by the ContextCleaner / the caller's cache cleanup.
    val idx = Positional.withRowIndex(
      df.withColumn("__u", Mixture.unitHash(col(keyCol))),
      Seq(col(labelCol), col("__u"), col(keyCol)), "__gi")
      .localCheckpoint(true)
    val offs = idx.groupBy(col(labelCol).as("__l"))
      .agg(min(col("__gi")).as("__off"), count(lit(1)).as("__n"))
    idx.join(broadcast(offs), col(labelCol) <=> col("__l"))
      .withColumn("__rk", col("__gi") - col("__off") + lit(1L))
      .withColumn("split",
        when(col("__rk") <= floor(col("__n") * trainFrac + 0.5), "train")
          .when(col("__rk") <= floor(col("__n") * cut2 + 0.5), "val")
          .otherwise("test"))
      .drop("__u", "__gi", "__l", "__off", "__n", "__rk")
  }

  /** Two-way stratified split: exactly `floor(n·fraction + 0.5)` rows
    * per stratum in the first frame, the complement in the second. */
  def twoWay(df: DataFrame, labelCol: String, keyCol: String,
             fraction: Double): (DataFrame, DataFrame) = {
    val t = tagged(df, labelCol, keyCol, fraction, 0.0)
    (t.filter(col("split") === "train").drop("split"),
      t.filter(col("split") =!= "train").drop("split"))
  }

  /** Reference's 60/20/20 train/val/test — one pass, one rank. */
  def threeWay(df: DataFrame, labelCol: String, keyCol: String,
               trainFrac: Double = 0.6, valFrac: Double = 0.2)
      : (DataFrame, DataFrame, DataFrame) = {
    val t = tagged(df, labelCol, keyCol, trainFrac, valFrac)
    (t.filter(col("split") === "train").drop("split"),
      t.filter(col("split") === "val").drop("split"),
      t.filter(col("split") === "test").drop("split"))
  }
}
