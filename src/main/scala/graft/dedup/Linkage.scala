package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage weights (Fellegi & Sunter
  * 1969) — the scoring layer that turns field-by-field agreement into a
  * calibrated match score, sitting on top of the candidate generation
  * the blocking family already provides ([[SortedNeighborhood]], the
  * Jaro-Winkler comparator of q134).
  *
  * The u-probability of a field — the chance two RANDOM records agree on
  * it — is estimable directly from the value-frequency histogram, no
  * labels needed: `u = Σ_v n_v(n_v−1) / (N(N−1))`. A field that agrees
  * by coincidence often (few distinct values) earns a small agreement
  * weight; a field whose agreement is rare (names) earns a large one.
  * The m-probability (agreement among TRUE matches) is the data-entry
  * quality prior; estimating it needs labeled pairs or EM, so it is a
  * caller-supplied constant here (default 0.95), documented per the
  * standard practice of seeding EM with a fixed m.
  *
  * Weights: `w_agree = log₂(m/u)`, `w_disagree = log₂((1−m)/(1−u))` —
  * a candidate pair's score is the sum of its per-field weights.
  *
  * Scale shape: ONE corpus pass — the fields melt into (field, value)
  * rows inside the projection, one hash aggregate builds every field's
  * frequency histogram at once, and a field-bounded rollup finishes.
  * Null field values are excluded (a null agrees with nothing); each
  * field's N is its own non-null count.
  */
object Linkage {

  /** Per-field u-probabilities and Fellegi-Sunter weights:
    * `(field, n, n_distinct, u_prob, w_agree, w_disagree)` ordered by
    * field name. `fields` maps field name → expression (cast to string
    * for the shared melt). */
  def fsWeights(df: DataFrame, fields: Seq[(String, Column)],
                m: Double = 0.95): DataFrame = {
    require(fields.nonEmpty, "at least one field required")
    require(m > 0 && m < 1, s"m must be in (0,1): $m")
    val melted = df.select(explode(map(
      fields.flatMap { case (n, c) => Seq(lit(n), c.cast("string")) }: _*))
      .as(Seq("__f", "__v")))
      .where(col("__v").isNotNull)
    val hist = melted.groupBy(col("__f"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    def d(c: Column) = c.cast("decimal(38,0)")
    hist.groupBy(col("__f"))
      .agg(sum(col("__c")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(d(col("__c")) * (d(col("__c")) - 1)).as("__agree2"))
      .select(Seq(col("__f").as("field"), col("n"), col("n_distinct")) ++ {
        val n = col("n").cast("double")
        val u = col("__agree2").cast("double") / (n * (n - 1))
        Seq(round(u, 8).as("u_prob"),
          round(when(u > 0, log2(lit(m) / u)), 4).as("w_agree"),
          round(when(u < 1, log2(lit(1 - m) / (lit(1.0) - u))), 4)
            .as("w_disagree"))
      }: _*)
      .orderBy(col("field"))
  }
}
