package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based nonparametric statistics — Mann-Whitney/Wilcoxon rank-sum
  * and Spearman rank correlation — completing the distribution-free test
  * family (chi-square q201, KS q212, log-rank q208): no normality
  * assumption, outlier-proof by construction.
  *
  * The shared engine trick: average ranks with ties are computed on the
  * DISTINCT-VALUE frame (per value: doubled average rank
  * `r₂ = 2·cum_before + cnt + 1` — an INTEGER), never by ranking raw
  * rows — so the rank windows run over |distinct values| rows and every
  * rank quantity stays exact. Formulas (tie-corrected variance, the
  * Pearson-on-ranks closed form) run in double over exact integer sums.
  */
object RankStats {

  /** Doubled-average-rank frame for one column: `(v, cnt, r2)`. */
  private def rank2(df: DataFrame, vCol: String): DataFrame = {
    val byV = df.groupBy(col(vCol).as("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    byV.withColumn("r2",
      lit(2) * coalesce(sum(col("cnt")).over(w), lit(0L)) + col("cnt") + 1)
  }

  /** Mann-Whitney U between `sampleFilter` rows (sample 1) and the rest:
    * `(n1, n2, u1, z)` — U from exact doubled rank sums, z from the
    * tie-corrected variance (no continuity correction, documented). */
  def mannWhitney(df: DataFrame, valueCol: String,
                  sampleFilter: Column): DataFrame = {
    val q = df.select(round(col(valueCol) * lit(1000000)).cast("long").as("v"),
      when(sampleFilter, 1L).otherwise(0L).as("s1"))
    val byV = q.groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), count(lit(1)).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    val ranked = byV.withColumn("r2",
      lit(2) * coalesce(sum(col("ct")).over(w), lit(0L)) + col("ct") + 1)
    val agg = ranked.agg(
      sum(col("c1")).as("n1"),
      (sum(col("ct")) - sum(col("c1"))).as("n2"),
      sum(col("c1").cast("decimal(19,0)") * col("r2").cast("decimal(19,0)"))
        .as("r1x2"),
      // tie term Σ(t³ − t) over tied groups, exact decimal
      sum(col("ct").cast("decimal(19,0)") * col("ct").cast("decimal(19,0)") *
        col("ct").cast("decimal(19,0)") -
        col("ct").cast("decimal(19,0)")).as("tie3"))
    agg.select({
      val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
      val n = n1 + n2
      // U₁ = R₁ − n1(n1+1)/2, with R₁ = r1x2/2 exact halves
      val u1 = col("r1x2").cast("double") / 2.0 - n1 * (n1 + 1) / 2.0
      val v = n1 * n2 / 12.0 *
        ((n + 1) - col("tie3").cast("double") / (n * (n - 1)))
      Seq(col("n1"), col("n2"),
        round(u1, 1).as("u1"),
        round(when(v > 0, (u1 - n1 * n2 / 2.0) / sqrt(v)), 4).as("z"))
    }: _*)
  }

  /** Spearman rank correlation between two numeric columns: Pearson on
    * exact doubled average ranks, 6 dp. */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(
      round(xCol * lit(1000000)).cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rx = rank2(base, "x").select(col("v").as("x"), col("r2").as("rx"))
    val ry = rank2(base, "y").select(col("v").as("y"), col("r2").as("ry"))
    val joined = base.join(rx, "x").join(ry, "y")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val out = joined.agg(
        count(lit(1)).as("n"),
        sum(d19(col("rx"))).as("sa"), sum(d19(col("ry"))).as("sb"),
        sum(d19(col("rx")) * d19(col("rx"))).as("saa"),
        sum(d19(col("ry")) * d19(col("ry"))).as("sbb"),
        sum(d19(col("rx")) * d19(col("ry"))).as("sab"))
      .select(col("n"), round({
        val n = col("n").cast("double")
        val cov = n * col("sab").cast("double") -
          col("sa").cast("double") * col("sb").cast("double")
        val va = n * col("saa").cast("double") -
          col("sa").cast("double") * col("sa").cast("double")
        val vb = n * col("sbb").cast("double") -
          col("sb").cast("double") * col("sb").cast("double")
        when(va > 0 && vb > 0, cov / sqrt(va * vb))
      }, 6).as("spearman_rho"))
    out
  }
}
