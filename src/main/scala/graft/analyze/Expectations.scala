package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: a rule set evaluated in ONE scan,
  * reported as a per-rule pass/fail table — the validation gate a pipeline
  * runs before promoting a snapshot (the engine-level generalization of the
  * reference's defensive `errors='coerce'` / dropna steps, SURVEY.md §1.2:
  * malformed input is measured, never an exception).
  *
  * Null semantics: a rule whose predicate evaluates to NULL on a row
  * FAILS that row (unknown is not a pass) — `when(pred, 0).otherwise(1)`
  * routes NULL to the failure branch on every engine identically.
  *
  * Scale shape: all rules fold into a single hash-aggregate projection over
  * the scan (one `sum(when…)` per rule — no per-rule jobs, no second
  * pass); the report is |rules| rows exploded from the 1-row aggregate.
  * At 100 TB this is the cost of one column scan regardless of rule count.
  */
object Expectations {

  /** `(rule, n_checked, n_failed, pass_rate)` for each named predicate,
    * `pass_rate` at 6 dp. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__f$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_checked"),
        col(s"__f$i").as("n_failed"))
    }
    one.select(explode(array(entries: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_failed").as("n_failed"))
      .withColumn("pass_rate",
        round((col("n_checked") - col("n_failed")).cast("double") /
          col("n_checked"), 6))
      .orderBy(col("rule"))
  }

  /** Tumbling-window wide form of the report — one row per window with a
    * failure-count column per rule. Streaming-compatible (a plain
    * windowed aggregation: runs under `readStream` with complete/update
    * output as the live data-quality monitor; same single-scan shape in
    * batch). */
  def windowedWide(df: DataFrame, tsCol: String, windowDuration: String,
                   rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val aggs = count(lit(1)).as("n_checked") +:
      rules.map { case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"fail_$name")
      }
    df.groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .drop("w")
      .select(col("window_start") +: col("n_checked") +:
        rules.map { case (n, _) => col(s"fail_$n") }: _*)
  }
}
