package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-quality metrics over an embedding column — the evaluation
  * layer for the [[Similarity.kmeans]] / label partitions: centroid
  * (simplified) silhouette. The full silhouette's per-point
  * all-pairs distances are O(n²) and unusable at corpus scale; the
  * centroid form (Hruschka 2004) replaces mean intra/inter-cluster
  * distances with distances to cluster CENTROIDS — O(n·k·d), one number
  * per point, and the standard large-n substitute.
  *
  * Determinism contract (what makes this SQL-oracle-able):
  *  - centroids are per-(cluster, dim) [[graft.operators.ExactAgg.davg]]
  *    means (order-invariant split sums) rounded to 4 dp;
  *  - each (point, centroid) squared distance is an EXACT integer: the
  *    per-dim term `(x_d − c_d)²` is 12-dp-quantized to a long before
  *    the dim-sum, so no float accumulation order can differ;
  *  - the silhouette `(b − a) / max(a, b)` runs in double over the two
  *    exact distances, is 12-dp-quantized, and the per-cluster mean is
  *    an exact integer sum.
  *
  * Scale shape: one posexplode to (point, dim, x) — the only
  * corpus-sized shuffle is the (point, cluster) distance aggregate; the
  * centroid frame is |clusters|·dims rows and BROADCAST onto the dim
  * key. Nothing is quadratic in n; the k-fan-out is the k of the
  * clustering, a constant. */
object ClusterEval {

  /** Per-cluster mean centroid-silhouette: `(label, n, mean_silhouette)`.
    * A corpus with a single cluster reports 0 by convention (no "other"
    * centroid to be separated from). */
  def centroidSilhouette(df: DataFrame, idCol: String, vecCol: String,
                         labelCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("id"), col(labelCol).as("lab"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = ex.groupBy(col("lab").as("clab"), col("dim"))
      .agg(graft.operators.ExactAgg.davg(col("x"), 4).as("c"))
    val d2 = ex.join(broadcast(cents), Seq("dim"))
      .withColumn("tq",
        round((col("x") - col("c")) * (col("x") - col("c")) * lit(1e12))
          .cast("long"))
      .groupBy(col("id"), col("lab"), col("clab"))
      .agg(sum(col("tq")).as("d2q"))
    val per = d2.groupBy(col("id"), col("lab"))
      .agg(min(when(col("clab") === col("lab"), col("d2q"))).as("aq"),
        min(when(col("clab") =!= col("lab"), col("d2q"))).as("bq"))
    val s = per.withColumn("sil_q", {
      val a = sqrt(col("aq").cast("double") / lit(1e12))
      val b = sqrt(col("bq").cast("double") / lit(1e12))
      when(col("bq").isNull, 0L).otherwise(
        round(when(greatest(a, b) > 0, (b - a) / greatest(a, b))
          .otherwise(lit(0.0)) * lit(1e12)).cast("long"))
    })
    s.groupBy(col("lab").as(labelCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col("sil_q")).cast("double") / 1e12 /
          count(lit(1)).cast("double"), 6).as("mean_silhouette"))
      .orderBy(col(labelCol))
  }
}
