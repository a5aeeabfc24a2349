package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-mean null imputation — the standard numeric-feature repair step
  * (sensor dropouts, failed parses from the permissive casts P6/q101):
  * nulls take their group's mean over the observed values, keeping the
  * row where deletion would bias the sample (same philosophy as
  * [[QuantileCut.winsorize]] for outliers).
  *
  * Engine-portable determinism: the mean is an exact DECIMAL sum over
  * the non-null values with ONE double division at the end (the q44
  * contract) — never a float `avg`, whose summation order varies with
  * partitioning. Cut table is one aggregation (groups are few),
  * broadcast back; imputation itself is scan-speed. */
object Impute {

  def groupMean(df: DataFrame, groupCol: String, valueCol: String,
                outCol: String = "value_i"): DataFrame = {
    val x = col(valueCol).cast("decimal(18,6)")
    val means = df.groupBy(col(groupCol)).agg(
      (sum(x).cast("double") / count(col(valueCol))).as("__mean"))
      .withColumnRenamed(groupCol, "__g")
    // NULL-SAFE join (<=>): groupBy keeps a null group, but a plain
    // equi-join back would silently DROP every null-group row — the
    // opposite of this operator's keep-the-row contract
    df.join(broadcast(means), col(groupCol) <=> col("__g"))
      .withColumn(outCol, coalesce(col(valueCol), col("__mean")))
      .drop("__mean", "__g")
  }
}
