package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank (Page et al. 1999) over an edge list — the
  * iterative-graph pattern of the engine (alongside the iterate-to-fixpoint
  * star contraction in [[graft.dedup.ConnectedComponents]]): rank mass
  * flows along out-edges, damped, with dangling-node mass redistributed
  * uniformly so the total stays 1.
  *
  * Scale shape per iteration: ONE join of the edge list with the current
  * rank table on `src` (ranks are (node, double) — tiny next to the edges;
  * AQE broadcasts them while they fit, hash-joins co-partitioned
  * otherwise) and ONE hash aggregation on `dst` — no driver-side state
  * beyond the scalar dangling mass. The edge list is persisted once and
  * reused every iteration; each new rank table is persisted and the
  * previous unpersisted, so lineage stays one iteration deep (no
  * exponential plan growth over 10+ iterations).
  *
  * Node ids must be long-castable. Ranks sum to 1 (mass-conservation
  * spec'd); iteration count is fixed — the standard contract for batch
  * PageRank on a large graph (convergence-δ stopping needs an extra
  * aggregation per iteration; compose one if needed).
  *
  * PINNED-LONG determinism: every iteration's state is a 1e-12-grid
  * long (`rank12`), each per-edge contribution, dangling share and
  * damped update rounding to the grid — so the walk is an exact
  * integer recurrence, order-free under any partitioning, identical
  * on any IEEE engine, and SQL-oracle-able as an unrolled twin (the
  * q97/q287 pattern). The grid error per node per iteration is a few
  * 1e-12 — invisible at the 4-dp reporting round and inside every
  * spec tolerance. Rounding conventions, chosen to pair exactly with
  * the SQL twin: column-side pins use Spark `round` (ties away from
  * zero ≡ DuckDB `round`); driver scalars use `math.round`
  * (floor(x+0.5) ≡ SQL `floor(x + 0.5)`).
  */
object PageRank {

  /** The closed-form pinned total-mass sequence `t12(i)`: total rank
    * after `i` damped iterations on the 1e-12 grid —
    * `t12(0) = 1e12`, `t12(i+1) = round((1−d)·1e12 + d·t12(i))`.
    * Shared by the distributed loop, the local finisher and the SQL
    * twin generator (inlined there as literals). */
  def totalRank12(iters: Int, damping: Double): Array[Long] = {
    val t = new Array[Long](iters + 1)
    t(0) = 1000000000000L
    var i = 0
    while (i < iters) {
      t(i + 1) = math.round((1.0 - damping) * 1e12 + damping * t(i))
      i += 1
    }
    t
  }

  /** Returns `(node, rank)` after `iters` damped power iterations from the
    * uniform start. Parallel edges count once (deduplicated) — pass a
    * weighted variant explicitly if multiplicity should matter.
    *
    * Two iterative-loop hazards are designed out:
    *  - each new rank table is an EAGER `localCheckpoint`, not a mere
    *    persist — persist caches data but the LOGICAL plan still nests
    *    the previous iteration's (and `ranks` is referenced twice per
    *    step, so the plan doubles per iteration: analysis time alone was
    *    61 s for 10 iterations on a 150-node graph before truncation,
    *    1.5 s after);
    *  - the dangling-mass scalar comes from the conservation identity
    *    `dangling = totalRank − Σcontribs` (Σcontribs = exactly the rank
    *    held by nodes WITH out-edges), so each iteration runs ONE
    *    distributed pass (the contribution aggregate), not a second
    *    rank-side scan. Σcontribs is read as a DRIVER scalar off the
    *    persisted contribs frame — microseconds of driver time on a
    *    cached one-pass aggregate at any corpus size (`totalRank` itself
    *    is the closed-form driver-side recurrence `(1−d) + d·totalRank`
    *    — no data needed). The in-plan alternative (crossJoin over a
    *    broadcast one-row aggregate) was tried and REVERTED: it
    *    serializes three waves per iteration (contribs materialization →
    *    BroadcastExchange of the one-row csum → eager checkpoint) and
    *    pays a fixed AQE broadcast-stage cost per iteration — measured
    *    2.3× slower end-to-end than the scalar `head` on the same graph,
    *    with no scale advantage (the scalar never grows with data). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded driver fast path (the CC/KCore finisher contract:
    // `graft.pagerank.localFinishEdges` ceiling, default 2^17 edges ≈
    // 2 MB collected, 0 disables): 10 power iterations on a graph this
    // small are pure per-job fixed cost distributed — ~1.2 s/iteration
    // of scheduling/checkpoint overhead against microseconds of
    // arithmetic. Same recurrence, GraphSpec pins local ≡ distributed.
    val mEdges = e.count()
    val ceiling = e.sparkSession.conf.getOption("graft.pagerank.localFinishEdges")
      .map(_.toLong).getOrElse(1L << 17)
    if (mEdges > 0 && mEdges <= ceiling) {
      val out = localRun(e, iters, damping)
      e.unpersist(blocking = false)
      return out
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pinned-long walk (scaladoc above): rank12 on the 1e-12 grid
    val t12 = totalRank12(iters, damping)
    val base12 = math.round((1.0 - damping) * 1e12 / n)
    var ranks = nodes.withColumn("rank12", lit(math.round(1e12 / n)))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"),
          round(col("rank12").cast("double") / col("deg")).cast("long").as("c12"))
        .groupBy(col("node")).agg(sum(col("c12")).as("contrib12"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // driver scalar off the PERSISTED contribs — one cheap action on a
      // cached one-row aggregate; exact long, so the dangling share is
      // the identical integer on any engine or partitioning
      val csum12 = contribs.agg(coalesce(sum(col("contrib12")), lit(0L)))
        .head().getLong(0)
      val dpn12 = math.round((t12(i) - csum12).toDouble / n)
      val prev = ranks
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base12) + round(lit(damping) *
            (coalesce(col("contrib12"), lit(0L)) + lit(dpn12)).cast("double"))
            .cast("long")).as("rank12"))
        .localCheckpoint(true)
      contribs.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      i += 1
    }
    e.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks.select(col("node"), (col("rank12").cast("double") / 1e12).as("rank"))
  }

  /** The IDENTICAL pinned-long recurrence in memory — same 1e-12 grid,
    * same rounding conventions (`math.rint`-free: Spark `round` ties
    * away from zero, mirrored here by `roundHalfAway`; driver scalars
    * by `math.round`), so local and distributed ranks are BIT-EQUAL,
    * not merely 1e-9-close. */
  private def localRun(e: DataFrame, iters: Int, damping: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val outDeg = new Array[Int](n)
    pairs.foreach(p => outDeg(idx(p._1)) += 1)
    val srcs = pairs.map(p => idx(p._1))
    val dsts = pairs.map(p => idx(p._2))
    val t12 = totalRank12(iters, damping)
    val base12 = math.round((1.0 - damping) * 1e12 / n)
    var rank = Array.fill(n)(math.round(1e12 / n))
    var it = 0
    while (it < iters) {
      val contrib = new Array[Long](n)
      var j = 0
      while (j < pairs.length) {
        contrib(dsts(j)) += roundHalfAway(rank(srcs(j)).toDouble / outDeg(srcs(j)))
        j += 1
      }
      var csum = 0L
      var k = 0
      while (k < n) { csum += contrib(k); k += 1 }
      val dpn12 = math.round((t12(it) - csum).toDouble / n)
      val next = new Array[Long](n)
      k = 0
      while (k < n) {
        next(k) = base12 + roundHalfAway(damping * (contrib(k) + dpn12).toDouble)
        k += 1
      }
      rank = next
      it += 1
    }
    nodes.indices.map(i => (nodes(i), rank(i) / 1e12)).toDF("node", "rank")
  }

  /** Ties away from zero — the Spark `round` / DuckDB `round` column
    * convention (where `math.round` is floor(x+0.5), which differs at
    * negative halves). */
  private[graph] def roundHalfAway(x: Double): Long =
    if (x >= 0) math.round(x) else -math.round(-x)
}
