package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` doorway the library needs: turning a hand-built
  * [[LogicalPlan]] (graft's custom operator nodes) back into a public
  * [[DataFrame]]. Lives under `org.apache.spark.sql` solely for that
  * access — no Spark internals are modified. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
