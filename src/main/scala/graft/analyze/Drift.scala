package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population Stability Index (PSI) — the standard drift monitor between
  * a baseline snapshot and a current one (feature drift before retrain,
  * corpus drift between crawls; the numeric-distribution sibling of
  * [[graft.text.CorpusStats.sourceTvDivergence]]'s token-space TV).
  *
  * Buckets are the BASELINE's equi-probable quantile cuts (exact
  * `percentile`, the q42 contract — identical cut doubles in any
  * engine); both snapshots are bucketed by `count(cuts < value)`, so
  * bucketing is a broadcast of ≤ nBuckets−1 doubles and one scan per
  * side, and the per-bucket PSI term
  * `(q − p)·ln(q/p)` (ε-floored at 1e−6 against empty buckets) is
  * computed from integer counts with one division each — engine-stable
  * up to the final ln. */
object Drift {

  /** Per-bucket drift rows `(bucket, n_base, n_cur, psi_term)`; total
    * PSI = Σ psi_term (< 0.1 stable, > 0.25 drifted by the usual rule
    * of thumb). */
  def psi(base: DataFrame, current: DataFrame, valueCol: String,
          nBuckets: Int = 10, scale: Int = 4): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = base.agg(
      expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("cuts"))
    def bucketed(df: DataFrame) = df
      .join(broadcast(cuts))
      .select(size(filter(col("cuts"), c => c < col(valueCol))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val b = bucketed(base).withColumnRenamed("n", "n_base")
    val c = bucketed(current).withColumnRenamed("n", "n_cur")
    val eps = 1e-6
    b.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .join(broadcast(b.agg(sum(col("n_base")).as("__tb"))))
      .join(broadcast(c.agg(sum(col("n_cur")).as("__tc"))))
      .withColumn("__p", greatest(col("n_base").cast("double") / col("__tb"), lit(eps)))
      .withColumn("__q", greatest(col("n_cur").cast("double") / col("__tc"), lit(eps)))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        round((col("__q") - col("__p")) * log(col("__q") / col("__p")), scale)
          .as("psi_term"))
  }
}
