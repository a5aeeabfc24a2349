package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural graph statistics on an undirected edge list — degree
  * assortativity (Newman 2002: do hubs attach to hubs?) and Adamic-Adar
  * link prediction (Adamic & Adar 2003: which non-adjacent pairs share
  * the most — rarest — neighbors?). Completes the co-occurrence-graph
  * family next to triangles ([[Triangles]]) and k-core ([[KCore]]).
  *
  * Scale shape: everything is edge-list relational algebra — degree is
  * one count-aggregate over directed edge ends, assortativity one more
  * join + moment aggregate (exact DECIMAL sums, double only in the final
  * closed form), and Adamic-Adar expands wedges per CENTER node from its
  * sorted neighbor array (the same in-row pair lambda as the
  * co-occurrence builder), so the only shuffles are the neighbor-list
  * aggregate and the (u,v)-keyed score sum. Hub nodes make the wedge
  * expansion quadratic in their degree by definition — at corpus scale
  * callers cap or sample super-hub neighborhoods first (the standard
  * LSH-style guard); here the graphs are co-basket graphs whose degree
  * is bounded by catalog co-occurrence, not corpus size.
  *
  * Determinism: Adamic-Adar's per-wedge weight `1/ln(deg z)` is quantized
  * to a 12-dp long BEFORE the sum (deg is an integer, so the quantized
  * term is engine-identical), making the score an exact integer sum —
  * the top-k cut has no float-boundary risk and ties break on (u, v).
  */
object LinkPrediction {

  /** Distinct co-occurrence edges `(a, b)` with `a < b` from (group,
    * item) rows, kept only when the pair co-occurs in ≥ `minSupport`
    * groups: one shuffle on the group key, pair expansion inside the row
    * over the sorted distinct-item array (groups are basket-sized, so
    * the quadratic is per-row and tiny), then a pair-keyed support
    * count. `minSupport` is the density throttle that keeps the graph's
    * degree CO-OCCURRENCE-bounded, not corpus-bounded: at support 1 a
    * large basket corpus yields a near-clique of single-coincidence
    * edges whose wedge expansion is quadratic in a degree that grows
    * with corpus size — at support ≥ 2 the noise edges (the vast
    * majority under sparse random co-occurrence) vanish and downstream
    * wedge counts stay flat as the corpus scales. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
                        itemCol: String, minSupport: Long = 1L): DataFrame = {
    // Self-join formulation, ONE corpus shuffle, everything inside
    // whole-stage codegen. The explicit repartition on the group key is
    // the only exchange the (group, item) stream pays: HashPartitioning(g)
    // satisfies the dedup aggregate's ClusteredDistribution(g, i) AND both
    // join sides' requirement, so dropDuplicates and the equi-join add no
    // further exchanges (the shared subtree's exchange is reused across
    // the two aliases). A collect_set + native-pair-explode variant was
    // measured SLOWER (3.9 s vs 2.7 s at sf0.1): ObjectHashAggregate's
    // per-group array buffers plus per-pair struct boxing feed the
    // support count generic rows, where the join's UnsafeRow output keeps
    // the count agg codegen'd. Scale: the per-basket quadratic is
    // identical by definition, but here a pathological hot basket is an
    // AQE-splittable skewed JOIN key, not one unsplittable aggregation
    // buffer row.
    val it = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .repartition(col("g"))
      .dropDuplicates("g", "i")
    it.alias("x").join(it.alias("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("__supp"))
      .where(col("__supp") >= minSupport)
      .select(col("a"), col("b"))
  }

  /** Both orientations of a distinct `(a, b)` edge list: 2|E| directed
    * ends `(x, y)`. */
  private def directedEnds(edges: DataFrame): DataFrame =
    edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))

  /** Degree assortativity coefficient: Pearson correlation of the degree
    * pairs at the two ends of every directed edge end (each undirected
    * edge counted in both orientations, the standard convention). One
    * row `(n_ends, assortativity)`; moments are exact DECIMAL sums, the
    * closed form runs in double over those exact integers. NULL when the
    * graph is degree-regular (zero variance). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    // materialize the EDGE list once (edge-bounded, tiny) BEFORE the
    // orientation union: checkpointing `ends` instead (the round-11
    // shape) still ran the upstream co-occurrence aggregation once PER
    // ORIENTATION inside the checkpoint job itself — ReusedExchange
    // dedupes the shuffle write, not the aggregation read, so the
    // profile showed 2×|pairs| rows entering the checkpoint. With the
    // edges checkpointed, the union and both downstream consumers
    // replay a 7 k-row materialized frame (profiled 2.4 M → 14 k rows
    // into the end list at sf0.1)
    val ends = directedEnds(edges.localCheckpoint(true))
    val deg = ends.groupBy(col("x").as("v")).agg(count(lit(1)).as("d"))
    // the degree table is ITEM-bounded (one row per node), never
    // corpus-bounded — broadcast both sides of the decoration join
    val pairs = ends
      .join(broadcast(deg.select(col("v").as("x"), col("d").as("di"))), Seq("x"))
      .join(broadcast(deg.select(col("v").as("y"), col("d").as("dj"))), Seq("y"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    pairs.agg(
        count(lit(1)).as("n_ends"),
        sum(d19(col("di"))).as("__sx"), sum(d19(col("dj"))).as("__sy"),
        sum(d19(col("di")) * d19(col("di"))).as("__sxx"),
        sum(d19(col("dj")) * d19(col("dj"))).as("__syy"),
        sum(d19(col("di")) * d19(col("dj"))).as("__sxy"))
      .select(col("n_ends"), round({
        val n = col("n_ends").cast("double")
        val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
        val cov = n * col("__sxy").cast("double") - sx * sy
        val va = n * col("__sxx").cast("double") - sx * sx
        val vb = n * col("__syy").cast("double") - sy * sy
        when(va > 0 && vb > 0, cov / sqrt(va * vb))
      }, 6).as("assortativity"))
  }

  /** Adamic-Adar link prediction: top-`k` NON-adjacent pairs by
    * `AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z)` — common neighbors,
    * discounted by how promiscuous each shared neighbor is. Wedges are
    * expanded per center z from its sorted neighbor array; each wedge
    * carries the 12-dp-quantized weight of ITS CENTER, so the (u,v) sum
    * is exact and the ranking deterministic. Existing edges are removed
    * with a broadcast-friendly left-anti join. Output
    * `(u, v, common, aa_score)` ordered by score desc, then (u, v). */
  def adamicAdar(edges: DataFrame, k: Int): DataFrame = {
    // NOTE on sharing: the edge list is consumed three times (both
    // directedEnds orientations + the non-adjacency anti-join). Both an
    // eager localCheckpoint and a lazy persist were measured SLOWER here
    // than recomputation — AQE's exchange reuse already shares the heavy
    // candidate shuffle, the duplicated final aggregations overlap on
    // otherwise-idle cores, and any materialization barrier serializes
    // that overlap.
    val e = edges
    val nbrs = directedEnds(e)
      .groupBy(col("x").as("z"))
      .agg(sort_array(collect_set(col("y"))).as("ns"))
      .where(size(col("ns")) >= 2)
    graft.functions.SortedPairs.register(edges.sparkSession)
    val wedges = nbrs
      .select(
        round(lit(1e12) / log(size(col("ns")).cast("double"))).cast("long")
          .as("__w12"),
        explode(call_function(
          graft.functions.SortedPairs.Name, col("ns"))).as("p"))
      .select(col("p.a").as("u"), col("p.b").as("v"), col("__w12"))
    val scored = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"), sum(col("__w12")).as("__s12"))
    scored
      .join(e, scored("u") === e("a") && scored("v") === e("b"),
        "left_anti")
      .select(col("u"), col("v"), col("common"),
        round(col("__s12").cast("double") / 1e12, 6).as("aa_score"))
      .orderBy(desc("aa_score"), col("u"), col("v"))
      .limit(k)
  }
}
