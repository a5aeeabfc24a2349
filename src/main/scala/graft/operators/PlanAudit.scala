package graft.operators

import org.apache.spark.sql.DataFrame

/** Physical-plan introspection as data: the operator census of a query's
  * executed plan — "how many exchanges / joins / scans did this REALLY
  * plan" — queryable instead of eyeballed. The programmatic form of the
  * `.explain` discipline this engine's PlanSpec enforces: a pipeline can
  * assert its own plan budget ("≤ 2 shuffles") in CI, or log the census
  * per run to catch plan regressions (a broadcast silently degrading to
  * sort-merge) in production telemetry.
  *
  * Driver-side by nature (plans live on the driver); cost is O(plan
  * nodes), never touches data.
  */
object PlanAudit {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  /** AQE-aware walk: `AdaptiveSparkPlanExec` is CHILDLESS from the tree
    * API's view (its plan-of-record is a private field), so a plain
    * `collect` stops dead at the wrapper — descend through its current
    * physical plan explicitly. Before execution that is the initial
    * plan; after, the final adaptive one. */
  private def names(p: SparkPlan): Seq[String] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    p.nodeName +: kids.flatMap(names)
  }

  /** `(op, n)` census of the physical plan, alphabetical. */
  def census(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    names(df.queryExecution.executedPlan)
      .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
      .toSeq.sortBy(_._1).toDF("op", "n")
  }

  /** Convenience predicate for plan-budget assertions. */
  def countOf(df: DataFrame, opSubstring: String): Long =
    names(df.queryExecution.executedPlan).count(_.contains(opSubstring)).toLong
}
