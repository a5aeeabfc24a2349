package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding with additive smoothing — the standard
  * high-cardinality categorical feature for tree/linear models
  * (Micci-Barrecca 2001). LOO, because the naive per-category target mean
  * LEAKS each row's own label into its feature (the classic silent
  * overfit); smoothing, because rare categories otherwise encode to their
  * own noise.
  *
  * `enc_i = (Σ_g y − y_i + m·prior) / (n_g − 1 + m)` with `prior` the
  * global target rate. All sums are exact longs over a 0/1 target; the
  * division is the only float op, identical on every engine, rounded at
  * 6 dp.
  *
  * Scale shape: one category-keyed aggregate (|categories| rows,
  * broadcast back) and one global 1-row frame; the encode itself rides
  * the scan. No per-fold re-aggregation — LOO is algebra, not a loop.
  */
object Encoding {

  /** Input plus `target_enc` (6 dp). `target` must evaluate to 0/1. */
  def targetEncodeLoo(df: DataFrame, catCol: String, target: Column,
                      smoothing: Double = 10.0): DataFrame = {
    val y = when(target, 1L).otherwise(0L)
    val withY = df.withColumn("__y", y)
    val stats = withY.groupBy(col(catCol).as("__c"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"))
    val global = withY.agg(
      (sum(col("__y")).cast("double") / count(lit(1))).as("__prior"))
    withY
      .join(broadcast(stats), col(catCol) <=> col("__c"))
      .crossJoin(broadcast(global))
      .withColumn("target_enc",
        round((col("__s") - col("__y") + lit(smoothing) * col("__prior")) /
          (col("__n") - 1 + lit(smoothing)), 6))
      .drop("__y", "__c", "__n", "__s", "__prior")
  }
}
