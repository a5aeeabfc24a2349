package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Local Outlier Factor (Breunig et al. 2000) over an embedding column —
  * DENSITY-relative outlier scoring: a point is anomalous if its local
  * density is low compared to its neighbors' (a cluster-edge point and a
  * global stray both score > 1; a deep-cluster point ≈ 1). The
  * embedding-space data-quality probe next to [[graft.ml.IsolationForest]]
  * (feature-space) — mislabeled/garbage vectors surface before they
  * poison contrastive training.
  *
  * Distance: cosine distance `1 − cos` via the native codegen'd cosine,
  * 12-dp-quantized — exact longs everywhere downstream. Neighborhoods
  * are EXACTLY the k nearest under the total order `(dist, id)` (the
  * textbook ≤ k-distance set can exceed k on ties; pinning to k with id
  * ties is deterministic and SQL-oracle-able).
  *
  * `reach(a,b) = max(kdist(b), d(a,b))`; `lrd(a) = k/Σ_b reach(a,b)`
  * (12-dp-pinned); `LOF(a) = (Σ_b lrd(b))/k / lrd(a)` — exact integer
  * sums with single double divisions at the pin points.
  *
  * Scale: this is the BRUTE N² formulation — correct reference for
  * corpus-sample audits (N bounded by the caller); at corpus scale the
  * candidate pairs come from the IVF/LSH bucketing of
  * [[Similarity.kmeansAssign]]/[[graft.dedup.Dedup.embeddingNearDupPairs]]
  * and LOF runs within buckets (the SemDeDup trade: cross-bucket
  * neighbors sacrificed by design). */
object Lof {

  /** Top-`topN` outliers: `(id, kdist, lrd, lof)` ordered by
    * (lof desc, id). `k` = neighborhood size. */
  def bruteTop(df: DataFrame, idCol: String, vecCol: String,
               k: Int, topN: Int): DataFrame = {
    require(k >= 1 && topN >= 1, s"need k, topN >= 1: $k, $topN")
    // widen a narrow single-row-group scan: the N² pair stage otherwise
    // runs on the scan's 2-3 partitions while the rest of the cores idle
    val pts = graft.operators.Spread.widen(
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")),
      col("id"))
    val d12 = round((lit(1.0) - Similarity.cosine(col("a.v"), col("b.v")))
      * lit(1e12)).cast("long")
    val pairs = pts.alias("a").join(pts.alias("b"),
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nb"), d12.as("d"))
    val w = Window.partitionBy(col("id")).orderBy(col("d"), col("nb"))
    val knn = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    // k-distance of every point = its k-th neighbor distance
    val kdist = knn.groupBy(col("id")).agg(max(col("d")).as("kd"))
    // reachability wrt each NEIGHBOR's k-distance; Σ over the k
    // neighbors → lrd, pinned at 12 dp of the inverse
    val lrd = knn
      .join(kdist.select(col("id").as("nb"), col("kd").as("kd_nb")), "nb")
      .groupBy(col("id"))
      .agg(sum(greatest(col("d"), col("kd_nb"))).as("rsum"))
      .select(col("id"),
        // duplicate-point degenerate (all k neighbors at distance 0):
        // rsum = 0 would send lrd to ∞ — clamp the denominator to 1e-5
        // distance units, capping lrd12 at k·1e17 (inside a long even at
        // k ~ 50; mirrored in the SQL oracle)
        round(lit(k) * lit(1e12) /
          (greatest(col("rsum"), lit(10000000L)).cast("double") / 1e12))
          .cast("long").as("lrd12"))
    val lof = knn
      .join(lrd.select(col("id").as("nb"), col("lrd12").as("lrd_nb")), "nb")
      .groupBy(col("id"))
      .agg(sum(col("lrd_nb")).as("nlsum"))
      .join(lrd, "id")
      .join(kdist, "id")
      .select(col("id"),
        round(col("kd").cast("double") / 1e12, 6).as("kdist"),
        round(col("lrd12").cast("double") / 1e12, 4).as("lrd"),
        round(col("nlsum").cast("double") / lit(k) / col("lrd12"), 4).as("lof"))
    lof.orderBy(col("lof").desc, col("id")).limit(topN)
  }

  /** Hubness report (Radovanović et al. 2010) — the k-occurrence
    * distribution: how often each point appears in OTHER points'
    * k-nearest-neighbor lists. In high dimensions the distribution
    * right-skews violently (a few "hub" points appear in everyone's
    * neighborhood, many "anti-hubs" in nobody's) and every kNN-based
    * stage upstream (ANN retrieval, SemDeDup, [[bruteTop]] LOF) quietly
    * degrades — this is the one-row dashboard for that failure mode.
    * One row: `(n, k, max_nk, pct_antihubs, skewness)` — skewness of
    * N_k from exact integer moments (zeros included via the base join).
    *
    * Same brute N² neighborhood build as [[bruteTop]] (and the same
    * bucketed path at corpus scale); the N_k frame is node-sized. */
  def hubnessReport(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    val pts = graft.operators.Spread.widen(
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")),
      col("id"))
    val d12 = round((lit(1.0) - Similarity.cosine(col("a.v"), col("b.v")))
      * lit(1e12)).cast("long")
    val pairs = pts.alias("a").join(pts.alias("b"),
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nb"), d12.as("d"))
    val w = Window.partitionBy(col("id")).orderBy(col("d"), col("nb"))
    val nk = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("nb").as("id")).agg(count(lit(1)).as("cnt"))
    val full = pts.select(col("id")).join(nk, Seq("id"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c"))
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    full.agg(count(lit(1)).as("n"),
        sum(d19(col("c"))).as("s1"),
        sum(d19(col("c")) * d19(col("c"))).as("s2"),
        sum((d19(col("c")) * d19(col("c"))).cast("decimal(19,0)") * d19(col("c")))
          .as("s3"),
        max(col("c")).as("max_nk"),
        sum(when(col("c") === 0, 1L).otherwise(0L)).as("nz"))
      .select(col("n"), lit(k.toLong).as("k"), col("max_nk"),
        round(col("nz").cast("double") / col("n"), 6).as("pct_antihubs"),
        round({
          val n = col("n").cast("double")
          val m = col("s1").cast("double") / n
          val m2 = col("s2").cast("double") / n - m * m
          val m3 = col("s3").cast("double") / n -
            m * col("s2").cast("double") / n * 3 + m * m * m * 2
          when(m2 > 0, m3 / pow(m2, 1.5))
        }, 6).as("skewness"))
  }
}
