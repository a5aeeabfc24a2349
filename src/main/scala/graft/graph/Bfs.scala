package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS hop distances over an undirected edge list — the
  * reachability/eccentricity probe of the graph family: how far does
  * influence spread from a seed, how many hops until the co-occurrence
  * graph saturates (the small-world check next to [[Triangles]] /
  * [[RichClub]], and the building block a diameter estimate samples).
  *
  * Frontier-expanding relational BFS: each round joins the CURRENT
  * frontier (not the whole reached set) against the directed edge ends,
  * anti-joins the already-reached set, and unions the new layer in — so
  * round r shuffles O(|frontier_r| · avg-degree) rows and the reached
  * set is append-only (the BFS layering invariant makes the first visit
  * the minimum hop; no re-relaxation is ever needed). Lineage is
  * truncated per round (same checkpoint discipline as
  * [[graft.dedup.ConnectedComponents]]); rounds stop at `maxHops` or
  * when a frontier empties — one tiny count action per round, never a
  * driver-side node list.
  *
  * The source is pinned to the SMALLEST node id in the edge set (one
  * 1-row aggregate — deterministic under any partitioning, like
  * PageRank's dangling-mass scalar), so the operator is a pure function
  * of the edge set. Output: the hop histogram `(hop, n_nodes)` with one
  * `hop = -1` row counting nodes unreachable within `maxHops`, ordered
  * by hop.
  */
object Bfs {

  def hopHistogram(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val ends = symmetricEnds(edges)
    val srcRow = ends.agg(min(col("x"))).collect()(0)
    if (srcRow.isNullAt(0)) {
      ends.unpersist(blocking = false)
      return Seq.empty[(Int, Long)].toDF("hop", "n_nodes")
    }
    val dist = bfsDist(ends, srcRow.getLong(0), maxHops)
    val reachedHist = dist.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
    val unreached = ends.select(col("x").as("id")).distinct()
      .join(dist, Seq("id"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1).as("hop"), col("n_nodes"))
      .where(col("n_nodes") > 0)
    reachedHist.unionAll(unreached).orderBy(col("hop"))
  }

  /** Double-sweep diameter LOWER BOUND (Magnien et al.'s standard
    * heuristic, exact on trees): BFS from the min-id seed, re-BFS from
    * the farthest node found (ties to the smallest id — deterministic),
    * report both eccentricities; the second is the bound. One row:
    * `(source, ecc_source, far_node, ecc_far)` — each eccentricity
    * capped at `maxHops` and measured within the seed's component. */
  def doubleSweep(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val ends = symmetricEnds(edges)
    val srcRow = ends.agg(min(col("x"))).collect()(0)
    if (srcRow.isNullAt(0)) {
      ends.unpersist(blocking = false)
      return Seq.empty[(Long, Int, Long, Int)]
        .toDF("source", "ecc_source", "far_node", "ecc_far")
    }
    val source = srcRow.getLong(0)
    val d1 = bfsDist(ends, source, maxHops)
    val far1 = d1.orderBy(col("hop").desc, col("id")).limit(1)
      .collect()(0)
    val (farNode, ecc1) = (far1.getLong(0), far1.getInt(1))
    val d2 = bfsDist(ends, farNode, maxHops)
    val ecc2 = d2.agg(max(col("hop"))).collect()(0).getInt(0)
    ends.unpersist(blocking = false)
    Seq((source, ecc1, farNode, ecc2))
      .toDF("source", "ecc_source", "far_node", "ecc_far")
  }

  /** Symmetric distinct directed ends of an undirected `(a, b)` edge
    * list, persisted for the per-round frontier joins. */
  private def symmetricEnds(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    e.select(col("a").as("x"), col("b").as("y"))
      .unionAll(e.select(col("b").as("x"), col("a").as("y")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Frontier-expanding BFS distances `(id, hop)` from `source` over the
    * persisted symmetric ends. */
  private def bfsDist(ends: DataFrame, source: Long, maxHops: Int): DataFrame = {
    val spark = ends.sparkSession
    import spark.implicits._
    var dist = truncate(Seq((source, 0)).toDF("id", "hop"))
    var frontier = dist
    var hop = 0
    var frontierSize = 1L
    while (frontierSize > 0 && hop < maxHops) {
      hop += 1
      val nbrs = frontier.join(ends, frontier("id") === ends("x"))
        .select(col("y").as("id")).distinct()
      val fresh = truncate(
        nbrs.join(dist, Seq("id"), "left_anti")
          .select(col("id"), lit(hop).as("hop")))
      frontierSize = fresh.count()
      dist = truncate(dist.unionAll(fresh))
      frontier = fresh
    }
    dist
  }

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
