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
    // pinned-long walk — PageRank's 1e-12 grid and rounding conventions
    // (see PageRank's scaladoc); the seed mass p pins once
    val p12 = math.round(1e12 / seedSet.size)
    val reset = seedSet.map(s => (s, p12)).toDF("node", "p12")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).union(reset.select(col("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodeP = nodes.join(broadcast(reset), Seq("node"), "left")
      .select(col("node"), coalesce(col("p12"), lit(0L)).as("p12"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val t12 = PageRank.totalRank12(iters, damping)
    // start at the reset distribution (the standard PPR initialization)
    var ranks = nodeP.select(col("node"), col("p12").as("rank12"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"),
          round(col("rank12").cast("double") / col("deg")).cast("long").as("c12"))
        .groupBy(col("node")).agg(sum(col("c12")).as("contrib12"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val csum12 = contribs.agg(coalesce(sum(col("contrib12")), lit(0L)))
        .head().getLong(0)
      val dangling12 = t12(i) - csum12
      val prev = ranks
      // teleport AND dangling mass land on the seeds, grid-pinned per
      // term: dangling·p in 1e-12 units is dangling12·p12/1e12
      ranks = nodeP.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (round(lit(1.0 - damping) * col("p12")).cast("long") +
            round(lit(damping) * (coalesce(col("contrib12"), lit(0L)) +
              round(lit(dangling12.toDouble) * col("p12") / 1e12).cast("long"))
              .cast("double")).cast("long")).as("rank12"))
        .localCheckpoint(true)
      contribs.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      i += 1
    }
    e.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    nodeP.unpersist(blocking = false)
    ranks.select(col("node"), (col("rank12").cast("double") / 1e12).as("rank"))
  }

  /** The IDENTICAL pinned-long recurrence in memory — bit-equal to the
    * distributed loop (see [[PageRank.localRun]]'s convention note). */
  private def localRun(e: DataFrame, seeds: Seq[Long], iters: Int,
                       damping: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val seedSet = seeds.distinct
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2) ++ seedSet).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val p12v = math.round(1e12 / seedSet.size)
    val p12 = new Array[Long](n)
    seedSet.foreach(s => p12(idx(s)) = p12v)
    val outDeg = new Array[Int](n)
    pairs.foreach(q => outDeg(idx(q._1)) += 1)
    val srcs = pairs.map(q => idx(q._1))
    val dsts = pairs.map(q => idx(q._2))
    val t12 = PageRank.totalRank12(iters, damping)
    import PageRank.roundHalfAway
    var rank = p12.clone()
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
      val dangling12 = t12(it) - csum
      val next = new Array[Long](n)
      k = 0
      while (k < n) {
        next(k) = roundHalfAway((1.0 - damping) * p12(k)) +
          roundHalfAway(damping *
            (contrib(k) + roundHalfAway(dangling12.toDouble * p12(k) / 1e12)).toDouble)
        k += 1
      }
      rank = next
      it += 1
    }
    nodes.indices.map(i => (nodes(i), rank(i) / 1e12)).toDF("node", "rank")
  }
}
