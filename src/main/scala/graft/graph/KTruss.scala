package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-truss decomposition probe (Cohen 2008): the maximal subgraph in
  * which EVERY edge participates in at least `k−2` triangles — the
  * edge-level cohesion filter between [[KCore]] (degree-based, admits
  * hub-and-spoke stars) and full clique mining (intractable): a k-truss
  * edge is embedded in overlapping triangles, so a near-dup cluster's
  * k-truss is its mutually-corroborated core, with the fragile
  * transitive bridges peeled away.
  *
  * Algorithm — iterative support peel, each round pure relational
  * algebra over the canonical `a < b` edge list:
  *
  *  1. enumerate triangles once via the same two-join wedge closure as
  *     [[Triangles.count]] (`(a,b) ⋈ (b,c) ⋈ (a,c)` over `a<b<c`);
  *  2. each triangle credits its THREE edges via a 3-way explode; a
  *     keyed count gives per-edge support;
  *  3. drop edges with support `< k−2`; repeat until the edge set is
  *     stable (removing an edge can destroy triangles that supported
  *     other edges — the fixpoint is what "within the subgraph" means).
  *
  * Scale shape: per round, two id-keyed equi-join shuffles (the wedge
  * bound `Σ deg⁺(v)²` of the triangle counter) plus one edge-keyed
  * aggregate. Rounds are lineage-truncated and convergence is an edge
  * COUNT action (monotone decreasing — equality means fixpoint), the
  * same discipline as [[graft.dedup.ConnectedComponents]]; peels
  * converge in a handful of rounds on co-occurrence graphs because the
  * support histogram collapses whole shells at once.
  *
  * Output one row: `(k, n_edges, n_nodes)` of the k-truss.
  */
object KTruss {

  def truss(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3 for a k-truss: $k")
    val minSupport = k - 2
    var e = truncate(
      edges.select(col(srcCol).cast("long").as("s"),
          col(dstCol).cast("long").as("d"))
        .filter(col("s").isNotNull && col("d").isNotNull &&
          col("s") =!= col("d"))
        .select(least(col("s"), col("d")).as("a"),
          greatest(col("s"), col("d")).as("b"))
        .distinct())
    var nEdges = e.count()
    var stable = nEdges == 0L
    var rounds = 0
    while (!stable) {
      rounds += 1
      if (rounds > 64)
        throw new IllegalStateException(
          s"k-truss peel did not converge after $rounds rounds")
      val wedges = e.toDF("a", "b").join(e.toDF("b", "c"), "b")
      val tri = wedges.join(e.toDF("a", "c"), Seq("a", "c"))
      val support = tri
        .select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("c").as("v")),
          struct(col("a").as("u"), col("c").as("v")))).as("e"))
        .groupBy(col("e.u").as("a"), col("e.v").as("b"))
        .agg(count(lit(1)).as("__supp"))
        .where(col("__supp") >= minSupport)
        .select(col("a"), col("b"))
      e = truncate(support)
      val n = e.count()
      stable = n == nEdges
      nEdges = n
    }
    val nNodes = e.select(explode(array(col("a"), col("b"))).as("v"))
      .agg(countDistinct(col("v"))).collect()(0).getLong(0)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((k, nEdges, nNodes)).toDF("k", "n_edges", "n_nodes")
  }

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
