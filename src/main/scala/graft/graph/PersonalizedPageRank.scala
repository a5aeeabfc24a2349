package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Personalized PageRank (Haveliwala 2002 topic-sensitive PR; the
  * "related items from HERE" primitive behind recommendation and local
  * graph exploration): identical damped power iteration to [[PageRank]],
  * but BOTH the teleport term and the dangling mass return to the seed
  * distribution instead of the uniform one — rank measures proximity to
  * the seeds, and nodes unreachable from them converge to exactly zero.
  *
  * Shares [[PageRank]]'s two design decisions verbatim (same rationale,
  * same measurements): eager `localCheckpoint` per iteration against
  * plan-doubling, and the conservation-identity dangling scalar
  * (`totalRank − Σcontribs`, read driver-side off the persisted contribs
  * aggregate) against a second distributed pass. Total mass follows the
  * same closed-form recurrence, seeds carry `p = 1/|seeds|`.
  *
  * Bounded driver fast path under the SAME conf ceiling as PageRank
  * (`graft.pagerank.localFinishEdges`); the spec pins local ≡
  * distributed at 1e-9 like GraphSpec does for the uniform walk.
  */
object PersonalizedPageRank {

  /** `(node, rank)` after `iters` iterations seeded on `seeds` (uniform
    * over the seed set). Seeds absent from the edge list still anchor
    * mass — they join the node universe. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          seeds: Seq[Long], iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(seeds.nonEmpty, "at least one seed required")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mEdges = e.count()
    val ceiling = spark.conf.getOption("graft.pagerank.localFinishEdges")
      .map(_.toLong).getOrElse(1L << 17)
    if (mEdges <= ceiling) {
      val out = localRun(e, seeds, iters, damping)
      e.unpersist(blocking = false)
      return out
    }
    val seedSet = seeds.distinct
    val p = 1.0 / seedSet.size
    val reset = seedSet.map(s => (s, p)).toDF("node", "p")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).union(reset.select(col("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodeP = nodes.join(broadcast(reset), Seq("node"), "left")
      .select(col("node"), coalesce(col("p"), lit(0.0)).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // start at the reset distribution (the standard PPR initialization)
    var ranks = nodeP.select(col("node"), col("p").as("rank")).localCheckpoint(true)
    var totalRank = 1.0
    var i = 0
    while (i < iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val csum = contribs.agg(coalesce(sum(col("contrib")), lit(0.0)))
        .head().getDouble(0)
      val dangling = totalRank - csum
      val prev = ranks
      ranks = nodeP.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("p") + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) +
              lit(dangling) * col("p"))).as("rank"))
        .localCheckpoint(true)
      contribs.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      totalRank = (1.0 - damping) + damping * totalRank
      i += 1
    }
    e.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    nodeP.unpersist(blocking = false)
    ranks
  }

  /** Same recurrence in memory (see [[PageRank.run]]'s tolerance note). */
  private def localRun(e: DataFrame, seeds: Seq[Long], iters: Int,
                       damping: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val seedSet = seeds.distinct
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2) ++ seedSet).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val p = new Array[Double](n)
    seedSet.foreach(s => p(idx(s)) = 1.0 / seedSet.size)
    val outDeg = new Array[Int](n)
    pairs.foreach(q => outDeg(idx(q._1)) += 1)
    val srcs = pairs.map(q => idx(q._1))
    val dsts = pairs.map(q => idx(q._2))
    var rank = p.clone()
    var totalRank = 1.0
    var it = 0
    while (it < iters) {
      val contrib = new Array[Double](n)
      var j = 0
      while (j < pairs.length) {
        contrib(dsts(j)) += rank(srcs(j)) / outDeg(srcs(j))
        j += 1
      }
      var csum = 0.0
      var k = 0
      while (k < n) { csum += contrib(k); k += 1 }
      val dangling = totalRank - csum
      val next = new Array[Double](n)
      k = 0
      while (k < n) {
        next(k) = (1.0 - damping) * p(k) + damping * (contrib(k) + dangling * p(k))
        k += 1
      }
      rank = next
      totalRank = (1.0 - damping) + damping * totalRank
      it += 1
    }
    nodes.indices.map(i => (nodes(i), rank(i))).toDF("node", "rank")
  }
}
