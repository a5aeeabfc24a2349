package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R×C contingency analysis: Pearson chi-square independence test and
  * Cramér's V effect size for two categorical columns — the
  * general-table extension of [[Experiment]]'s 2×2 conversion test
  * ("does event mix depend on weekday", "does language depend on
  * source").
  *
  * Exactness: observed counts are exact longs; expected counts and the
  * chi-square sum run in double over identical integer inputs
  * (`Σ (o·N − r·c)² / (r·c·N)` — the cross-multiplied form, so no
  * intermediate expected-count rounding), Cramér's
  * `V = sqrt(χ²/(N·(min(R,C)−1)))`.
  *
  * Scale shape: ONE (a, b) hash aggregate over the corpus; margins and
  * the statistic live on the R×C frame (broadcast joins). Cell sums are
  * quantized to 9-dp longs before the final add so the cross-cell
  * summation order cannot drift. */
object Contingency {

  /** One row: `(n, n_rows, n_cols, chi2, dof, cramers_v)` (4 dp). */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val colM = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("nr"), countDistinct(col("b")).as("nc"))
    val terms = cells
      .join(broadcast(rowM), "a").join(broadcast(colM), "b")
      .crossJoin(broadcast(tot))
      // ABSENT cells (o = 0) still contribute e = r·c/N to χ²;
      // enumerating them is avoidable: Σ_all e = N, so
      // χ² = Σ_present[(o−e)²/e − e] + N. Per present cell the bracket
      // is (o·N − r·c)²/(r·c·N) − r·c/N, quantized at 9 dp (signed)
      .select(col("n"), col("nr"), col("nc"),
        round({
          val num = col("o").cast("double") * col("n") -
            col("r").cast("double") * col("c")
          (num * num /
            (col("r").cast("double") * col("c") * col("n")) -
            col("r").cast("double") * col("c") / col("n")) * lit(1e9)
        }).cast("long").as("t9"))
    terms.groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(col("t9")).as("s9"))
      .withColumn("chi2d",
        col("s9").cast("double") / 1e9 + col("n").cast("double"))
      .select(col("n"),
        col("nr").as("n_rows"), col("nc").as("n_cols"),
        round(col("chi2d"), 4).as("chi2"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        round(sqrt(greatest(col("chi2d"), lit(0.0)) /
          (col("n") * (least(col("nr"), col("nc")) - 1))), 4).as("cramers_v"))
  }
}
