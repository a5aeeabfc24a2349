package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact TRIANGLE COUNTING on an undirected graph — the local-clustering
  * probe for similarity graphs: a near-dup component whose triangle
  * density is high is a tight clique of mutual duplicates; a low-density
  * one is a fragile transitive chain the keep-one-per-cluster policy
  * should distrust (same graph family as
  * [[graft.dedup.ConnectedComponents]] and [[PageRank]]).
  *
  * Input edges are canonical `src < dst` distinct pairs; a triangle
  * `a < b < c` is counted exactly once by the two-join wedge closure
  * `(a,b) ⋈ (b,c) ⋈ (a,c)` over the canonical orientation.
  *
  * Scale shape: both joins are equi-joins on single node ids (hash
  * shuffles of id pairs only — at n nodes and m edges the wedge frame
  * is `Σ deg⁺(v)²`, the standard bound). The canonical orientation IS
  * the classic degree-style optimization's cheap cousin: every wedge is
  * generated at its middle node only, halving the naive fan-out; for
  * power-law graphs the full Cohen orientation (order by degree, then
  * id) drops in by re-orienting edges before the same two joins —
  * [[countOriented]] does exactly that, bounding wedge width by the
  * arboricity instead of the max degree. */
object Triangles {

  /** Global triangle count over canonical `src < dst` edges:
    * `(n_edges, n_triangles)`. */
  def count(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // eager checkpoint: the edge list is consumed FOUR times (both wedge
    // sides, the closure probe, the n_edges agg) and is often the output
    // of an expensive upstream pipeline (q132 feeds the full n-gram
    // Jaccard subtree in) — without materialization each consumer
    // re-runs that subtree. The checkpointed frame is id pairs only.
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d")).distinct()
      .localCheckpoint(eager = true)
    val wedges = e.toDF("a", "b")
      .join(e.toDF("b", "c"), "b")
    val tri = wedges.join(e.toDF("a", "c"), Seq("a", "c"))
    e.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
      .crossJoin(tri.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles")))
  }

  /** [[count]] with Cohen's degree orientation: edges re-oriented from
    * lower-degree to higher-degree endpoint (ties by id) before the
    * wedge closure, so wedge width is bounded by each node's
    * SMALLER-side degree — the skew-robust form for power-law graphs.
    * Counts are identical to [[count]]; only the join fan-out changes. */
  def countOriented(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // same materialization discipline as [[count]] — e0 feeds the degree
    // count, both orientation joins, the closure probe and the edge agg
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d")).distinct()
      .localCheckpoint(eager = true)
    val deg = e0.select(explode(array(col("s"), col("d"))).as("v"))
      .groupBy(col("v")).agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    val withDeg = e0
      .join(deg.toDF("s", "deg_s"), "s")
      .join(deg.toDF("d", "deg_d"), "d")
    // orient: lower (deg, id) endpoint → higher; the orientation is a
    // total order, so each undirected edge gets exactly one direction
    val oriented = withDeg.select(
      when(struct(col("deg_s"), col("s")) < struct(col("deg_d"), col("d")),
        struct(col("s").as("u"), col("d").as("w")))
        .otherwise(struct(col("d").as("u"), col("s").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    // a triangle has exactly one vertex with out-edges to the other two
    // under an acyclic orientation: close the wedge at that vertex
    val wedges = oriented.toDF("u", "a")
      .join(oriented.toDF("u", "b"), "u")
      .filter(col("a") < col("b"))
    // the closing edge is checked against the CANONICAL id-ordered edge
    // set (= the input): under an acyclic orientation every triangle has
    // exactly one out-degree-2 vertex, so each is closed exactly once
    val tri = wedges.join(e0.toDF("a", "b"), Seq("a", "b"))
    e0.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
      .crossJoin(tri.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles")))
  }

  /** Per-node local clustering coefficient (Watts-Strogatz 1998):
    * `lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))` — how close each node's
    * neighborhood is to a clique; the node-level refinement of the
    * global [[count]]. Only nodes with `deg ≥ 2` appear (the coefficient
    * is undefined below that).
    *
    * Scale shape: the same a<b<c wedge-closure as [[count]] (each
    * triangle materializes ONCE), then each triangle credits its three
    * corners via one 3-way explode — per-node totals are a plain keyed
    * aggregate. `lcc` is exact-integer arithmetic rendered in double
    * (2T and deg(deg−1) are integers; one division at the end, 6 dp). */
  def localClustering(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d")).distinct()
      .localCheckpoint(eager = true)
    val deg = e.select(explode(array(col("s"), col("d"))).as("id"))
      .groupBy(col("id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    val wedges = e.toDF("a", "b").join(e.toDF("b", "c"), "b")
    val tri = wedges.join(e.toDF("a", "c"), Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    deg.filter(col("deg") >= 2)
      .join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(coalesce(col("triangles"), lit(0L)).cast("double") * 2 /
          (col("deg") * (col("deg") - 1)).cast("double"), 6).as("lcc"))
      .orderBy(col("id"))
  }
}
