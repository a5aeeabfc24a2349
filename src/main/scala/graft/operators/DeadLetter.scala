package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dead-letter routing: validate rows against ordered rules and ROUTE
  * failures to a quarantine side-output instead of dropping or crashing
  * — the operator form of the reference's `errors='coerce'` principle
  * (SURVEY.md §1.2: malformed input is data, not an exception) and the
  * enforcement sibling of [[graft.analyze.Expectations]] (which only
  * measures).
  *
  * A row's `reject_reason` is its FIRST failing rule (rule order is an
  * API contract), NULL predicates fail (unknown is not a pass). One
  * projection computes the reason; good/bad frames are two filters of
  * the same plan — Catalyst shares the scan, nothing runs twice when
  * both are consumed in one action tree.
  */
object DeadLetter {

  /** The input plus `reject_reason` (null = clean). */
  def tagged(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val reason = rules.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (name, pred)) => when(!coalesce(pred, lit(false)), name).otherwise(acc)
    }
    df.withColumn("reject_reason", reason)
  }

  def good(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    tagged(df, rules).filter(col("reject_reason").isNull).drop("reject_reason")

  def dead(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    tagged(df, rules).filter(col("reject_reason").isNotNull)

  /** `(reject_reason, n)` census with the clean count as reason 'ok'. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    tagged(df, rules)
      .groupBy(coalesce(col("reject_reason"), lit("ok")).as("reject_reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("reject_reason"))
}
