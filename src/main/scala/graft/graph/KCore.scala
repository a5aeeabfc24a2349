package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed K-CORE decomposition — the maximal subgraph in which
  * every node keeps at least `k` neighbors (Seidman 1983, "Network
  * structure and minimum degree"). On the near-dup graph this is the
  * robustness filter [[Triangles]] motivates: a 2-core member sits on a
  * CYCLE of similarity evidence (exact-dup groups expand to cliques and
  * survive; a fragile transitive chain a~b~c has degree-1 endpoints and
  * peels away), so "keep one per 2-core component, re-review the rest"
  * is a precision-first dedup policy.
  *
  * Algorithm: synchronous peeling — repeatedly delete every node whose
  * current degree is < k, until none remains. Each round is one
  * node-hash degree aggregate over the symmetrized edge list plus two
  * hash anti-joins (edges incident to a doomed endpoint drop); lineage
  * is truncated per round ([[graft.dedup.ConnectedComponents]]'s
  * checkpoint discipline) and the doomed count is the convergence probe
  * (one tiny action per round, never an edge materialization).
  *
  * Round count is the PEEL DEPTH of the graph — O(log n)-ish on
  * clustered dup graphs (most nodes fall in the first rounds), but a
  * bare n-node path with k = 2 peels two ends per round and needs n/2
  * rounds: pathological inputs belong on the driver finisher, which is
  * why the CC-style local finish (collected exact peel under
  * `graft.kcore.localFinishEdges` edges, default 2^17, 0 disables)
  * matters more here than for components. Both paths are exact and the
  * spec pins them equivalent.
  */
object KCore {

  /** Nodes of the `k`-core of the undirected graph given by `edges`
    * (orientation, duplicates and self-loops normalized away):
    * `(id, core_degree)` with `core_degree` the node's degree INSIDE
    * the core (≥ k by construction). Node ids must be numeric. */
  def core(edges: DataFrame, aCol: String, bCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Seq(aCol, bCol).foreach { c =>
      require(edges.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"node id column $c must be numeric, got ${edges.schema(c).dataType.simpleString}")
    }
    var e = truncate(
      edges.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .distinct())
    val nEdges = e.count()
    if (nEdges == 0L)
      return e.select(col("u").as("id"), col("v").as("core_degree")).limit(0)
    if (nEdges <= localFinishEdges(edges)) return localFinish(e, k)
    var rounds = 0
    var doomedCount = 1L
    while (doomedCount > 0L) {
      rounds += 1
      if (rounds > 4096) // peel depth of any non-adversarial graph is far
        // below this; a deeper input should have hit the local finisher
        throw new IllegalStateException(
          s"k-core did not converge after $rounds rounds")
      val deg = degrees(e)
      val doomed = deg.filter(col("core_degree") < k).select(col("id"))
      doomedCount = doomed.count()
      if (doomedCount > 0L) {
        e = truncate(
          e.join(doomed.toDF("u"), Seq("u"), "left_anti")
            .join(doomed.toDF("v"), Seq("v"), "left_anti")
            .select(col("u"), col("v")))
      }
    }
    degrees(e)
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("core_degree"))

  /** Same conf-driven ceiling contract as the CC finisher (2^17 edges
    * ~2 MB collected); `graft.kcore.localFinishEdges`, 0 disables. */
  private def localFinishEdges(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.kcore.localFinishEdges")
      .map(_.toLong).getOrElse(1L << 17)

  /** Exact in-memory peel (min-heap-free: repeated sweep is fine at this
    * size) over a collected edge list. */
  private def localFinish(e: DataFrame, k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.select(col("u"), col("v")).as[(Long, Long)].collect()
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.HashSet[Long]]
    pairs.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.HashSet.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.HashSet.empty) += u
    }
    var changed = true
    while (changed) {
      val doomed = adj.collect { case (n, nb) if nb.size < k => n }.toSeq
      changed = doomed.nonEmpty
      doomed.foreach { n =>
        adj(n).foreach(m => adj.get(m).foreach(_ -= n))
        adj.remove(n)
      }
    }
    adj.iterator.map { case (n, nb) => (n, nb.size.toLong) }.toSeq
      .toDF("id", "core_degree")
  }

  /** Lineage truncation between rounds — reliable checkpoint when a
    * checkpoint dir is configured, local otherwise. */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
