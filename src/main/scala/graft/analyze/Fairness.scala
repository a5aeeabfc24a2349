package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-fairness audit of a binary decision rule against a binary
  * outcome: per protected group the selection rate (demographic
  * parity), TPR and FPR (the equalized-odds pair), and each group's
  * ratio to the maximum selection rate — the "80% rule" column
  * regulators actually read. The operator takes the DECISION as a
  * column, so it audits rule-based and model-based selectors alike.
  *
  * Exactness: everything is a ratio of exact integer counts off ONE
  * group-keyed hash aggregate; the reference (max selection rate) is
  * derived from pinned per-group 6-dp rates, so the ratio column is
  * engine-identical. Output per group: `(grp, n, selected, sel_rate,
  * tpr, fpr, dp_ratio)` at 6/4 dp, ordered by grp. */
object Fairness {

  def report(df: DataFrame, groupCol: Column, decision: Column,
             outcome: Column): DataFrame = {
    val cells = df.select(groupCol.as("grp"),
        when(decision, 1L).otherwise(0L).as("d"),
        when(outcome, 1L).otherwise(0L).as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("selected"),
        sum(col("d") * col("y")).as("tp"),
        sum(col("d") * (lit(1L) - col("y"))).as("fp"),
        sum(col("y")).as("pos"))
      .withColumn("sel_rate",
        round(col("selected").cast("double") / col("n"), 6))
    val ref = cells.agg(max(col("sel_rate")).as("ref_rate"))
    cells.crossJoin(broadcast(ref))
      .select(col("grp"), col("n"), col("selected"), col("sel_rate"),
        round(when(col("pos") > 0,
          col("tp").cast("double") / col("pos")), 6).as("tpr"),
        round(when(col("n") - col("pos") > 0,
          col("fp").cast("double") / (col("n") - col("pos"))), 6)
          .as("fpr"),
        round(when(col("ref_rate") > 0,
          col("sel_rate") / col("ref_rate")), 4).as("dp_ratio"))
      .orderBy(col("grp"))
  }
}
