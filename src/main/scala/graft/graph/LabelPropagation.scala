package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-propagation community detection (Raghavan 2007) over the
  * undirected similarity graph — the soft-clustering sibling of
  * [[graft.dedup.ConnectedComponents]]: CC merges everything reachable,
  * LPA keeps densely-linked neighborhoods apart even when a thin bridge
  * connects them (the "two template families share one noisy edge" case
  * in dedup-graph review).
  *
  * Classic LPA is RANDOMIZED (visit order + random tie-break) and
  * non-reproducible. A naive deterministic variant — min-label
  * tie-break from an all-distinct start — degenerates to bounded-radius
  * connected components: every neighbor histogram starts all-ties, so
  * the tie rule (not density) decides everything and the smallest label
  * floods across bridges. This implementation breaks the symmetry the
  * way Leung 2009's node-preference variant does, but deterministically:
  *
  *  - SEED: each node adopts the highest-DEGREE node in its closed
  *    neighborhood (ties: self first, then smallest id) — local hubs
  *    become community seeds, so the first histograms are already
  *    non-trivial;
  *  - PROPAGATE: synchronous rounds, every node simultaneously adopting
  *    the most frequent neighbor label, ties to the smallest label (a
  *    total order) — and a node with no majority change keeps converging
  *    toward its dense side, because its intra-community neighbors vote
  *    together while a bridge contributes one vote.
  *
  * Any engine, any partitioning, any rerun produces the identical
  * labeling; the spec pins a bridged-triangles hand case (communities
  * survive the bridge) and partitioning invariance.
  *
  * Scale shape per round: one join of the label frame onto the
  * symmetrized edge list (labels shuffle on node id — the same key every
  * round) and one (node, label) count aggregate; lineage is truncated
  * per round exactly like [[KCore]]/[[PageRank]] so plans stay O(1)
  * deep. State is one long per node — no adjacency materialization.
  */
object LabelPropagation {

  /** `(id, label)` after seeding + `nIter` synchronous rounds; labels are
    * node ids (the community's seed hub). Isolated nodes never appear
    * (an edge list defines the population). */
  def run(edges: DataFrame, aCol: String, bCol: String,
          nIter: Int = 5): DataFrame = {
    require(nIter >= 1 && nIter <= 64, s"nIter out of range: $nIter")
    val sym = edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    // truncate ONCE: `und` joins into every round — without this the
    // (possibly expensive) upstream edge derivation re-executes per round
    val symT = truncate(sym)
    // same conf-driven local-finisher contract as KCore/CC: a graph small
    // enough to collect (≤2^17 edges ~2 MB) runs the IDENTICAL dynamics
    // in memory instead of 2·nIter distributed shuffles; the spec pins
    // local ≡ distributed
    val localMax = edges.sparkSession.conf
      .getOption("graft.lpa.localFinishEdges").map(_.toLong).getOrElse(1L << 17)
    val nEdges = symT.count()
    if (nEdges <= localMax) return localFinish(symT, nIter)
    val und = symT.unionAll(symT.select(col("v").as("u"), col("u").as("v")))
    val deg = und.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    // degree-seeded init over the CLOSED neighborhood: order by
    // (degree desc, self first, id asc), realized as max over a struct
    val cand = und
      .join(deg.withColumnRenamed("id", "v"), "v")
      .select(col("u"), col("v"), col("deg"), lit(0L).as("self"))
      .unionAll(deg.select(col("id").as("u"), col("id").as("v"),
        col("deg"), lit(1L).as("self")))
    var labels = truncate(
      cand.groupBy(col("u").as("id"))
        .agg(max(struct(col("deg"), col("self"), (-col("v")).as("nv")))
          .getField("nv").as("neg"))
        .select(col("id"), (-col("neg")).as("label")))
    for (_ <- 1 to nIter) {
      // neighbor label histogram → per node argmax(count desc, label asc):
      // max over struct(cnt, -label) realizes the total order natively
      labels = truncate(
        und.join(labels.withColumnRenamed("id", "v"), "v")
          .groupBy(col("u"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("u").as("id"))
          .agg(max(struct(col("cnt"), (-col("label")).as("nl")))
            .getField("nl").as("neg"))
          .select(col("id"), (-col("neg")).as("label")))
    }
    labels.orderBy(col("id"))
  }

  /** Exact in-memory run of the same seed + synchronous dynamics. */
  private def localFinish(sym: DataFrame, nIter: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val pairs = sym.select(col("u"), col("v")).as[(Long, Long)].collect()
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.HashSet[Long]]
    pairs.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.HashSet.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.HashSet.empty) += u
    }
    // seed: (degree desc, self first, id asc) over the closed neighborhood
    var labels: Map[Long, Long] = adj.iterator.map { case (v, nb) =>
      val best = (nb.iterator ++ Iterator(v)).maxBy(u =>
        (adj(u).size.toLong, if (u == v) 1L else 0L, -u))
      v -> best
    }.toMap
    for (_ <- 1 to nIter) {
      labels = adj.iterator.map { case (v, nb) =>
        val hist = nb.toSeq.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size.toLong) }
        v -> hist.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    labels.toSeq.sortBy(_._1).toDF("id", "label")
  }

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
