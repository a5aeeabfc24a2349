package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rich-club coefficient profile (Zhou & Mondragón 2004) of an undirected
  * edge list: for each degree threshold `k`,
  * `φ(k) = 2·E_k / (N_k·(N_k−1))` — the edge density among the nodes of
  * degree > k. A rising φ(k) means the hubs form their own densely wired
  * club (the "celebrity clique" structure assortativity
  * ([[LinkPrediction.degreeAssortativity]]) summarizes to one number,
  * resolved along the degree axis).
  *
  * Scale shape — NO per-k passes over the graph: degree is one count
  * aggregate over directed edge ends; each edge is then tagged with
  * `min(deg(a), deg(b))` via two broadcast joins of the node-bounded
  * degree table, and BOTH curves come from cumulative sums over two tiny
  * histograms (degree histogram → N_k, edge-min-degree histogram → E_k,
  * each ≤ max-degree rows): `N_k = #{v : deg v > k}`,
  * `E_k = #{(a,b) : min(dega, degb) > k}`. The k axis is a literal
  * `sequence(1, maxK)` cross-joined against the histogram frame —
  * everything after the first aggregate is degree-bounded, not
  * corpus-bounded. All-integer arithmetic; φ in double at the end.
  */
object RichClub {

  /** One row per `k ∈ [1, maxK]`: `(k, n_k, e_k, phi)`; φ is NULL when
    * fewer than 2 nodes clear the threshold. */
  def coefficients(edges: DataFrame, aCol: String, bCol: String,
                   maxK: Int): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1: $maxK")
    val spark = edges.sparkSession
    // the edge frame is consumed THREE ways below (degree rollup, then
    // degrees ride twice as broadcasts while the edges join again) and
    // its upstream derivation is typically the expensive part (a
    // co-occurrence self-join); an eager localCheckpoint materializes it
    // exactly once at pair-list size — the q249/q288 truncate precedent
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val ends = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
    val deg = ends.groupBy(col("v")).agg(count(lit(1)).as("d"))
    val ks = spark.range(1, maxK + 1).select(col("id").as("k"))
    // N_k from the degree histogram: nodes with d > k
    val nk = deg.groupBy(col("d")).agg(count(lit(1)).as("nv"))
      .crossJoin(broadcast(ks))
      .filter(col("d") > col("k"))
      .groupBy(col("k")).agg(sum(col("nv")).as("n_k"))
    // E_k from the edge min-degree histogram: edges with min(da,db) > k
    val emin = e
      .join(broadcast(deg.select(col("v").as("a"), col("d").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("v").as("b"), col("d").as("db"))), Seq("b"))
      .select(least(col("da"), col("db")).as("md"))
      .groupBy(col("md")).agg(count(lit(1)).as("ne"))
    val ek = emin.crossJoin(broadcast(ks))
      .filter(col("md") > col("k"))
      .groupBy(col("k")).agg(sum(col("ne")).as("e_k"))
    ks.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_k"), lit(0L)).as("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"))
      .withColumn("phi", round(
        when(col("n_k") >= 2,
          lit(2.0) * col("e_k") / (col("n_k").cast("double") * (col("n_k") - 1))),
        6))
      .orderBy(col("k"))
  }

  /** Discrete power-law exponent MLE for the degree distribution
    * (Clauset, Shalizi & Newman 2009's continuous approximation):
    * `α̂ = 1 + n / Σ ln(dᵢ/(dmin − ½))` over degrees ≥ `dmin`, with the
    * standard error `(α̂−1)/√n`. One row
    * `(n_nodes, n_tail, alpha, alpha_se)` — the "is this graph/corpus
    * scale-free" readout next to the token-side Zipf fit (q221).
    *
    * Determinism: degrees are exact integer counts; each tail node's
    * log term is one pinned double quantized to a 9-dp long and summed
    * exactly. Scale: degree aggregate + a degree-histogram-sized sum. */
  def powerLawAlpha(edges: DataFrame, aCol: String, bCol: String,
                    dMin: Long): DataFrame = {
    require(dMin >= 1, s"dMin must be >= 1: $dMin")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val all = deg.agg(count(lit(1)).as("n_nodes"))
    val tail = deg.filter(col("d") >= dMin)
      .agg(count(lit(1)).as("n_tail"),
        sum(round(log(col("d").cast("double") / (lit(dMin) - 0.5)) * lit(1e9))
          .cast("long")).as("l9"))
    all.crossJoin(broadcast(tail))
      .select(col("n_nodes"), col("n_tail"),
        round(when(col("l9") > 0,
          lit(1.0) + col("n_tail").cast("double") / (col("l9").cast("double") / 1e9)),
          6).as("alpha"),
        round(when(col("l9") > 0 && col("n_tail") > 0,
          (col("n_tail").cast("double") / (col("l9").cast("double") / 1e9)) /
            sqrt(col("n_tail").cast("double"))), 6).as("alpha_se"))
  }
}
