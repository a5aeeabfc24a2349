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
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    val ends = e.select(col("a").as("x"), col("b").as("y"))
      .unionAll(e.select(col("b").as("x"), col("a").as("y")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcRow = ends.agg(min(col("x"))).collect()(0)
    if (srcRow.isNullAt(0)) {
      ends.unpersist(blocking = false)
      return Seq.empty[(Int, Long)].toDF("hop", "n_nodes")
    }
    val source = srcRow.getLong(0)
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
    val reachedHist = dist.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
    val unreached = ends.select(col("x").as("id")).distinct()
      .join(dist, Seq("id"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1).as("hop"), col("n_nodes"))
      .where(col("n_nodes") > 0)
    reachedHist.unionAll(unreached).orderBy(col("hop"))
  }

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
