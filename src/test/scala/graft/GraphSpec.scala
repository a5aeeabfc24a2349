package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.graph.PageRank
import graft.sim.Similarity

/** PageRank (hand-computed graphs, mass conservation, dangling nodes) and
  * distributed k-means (designed-cluster recovery). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Driver-side reference power iteration — same formula, no Spark. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    val out = es.groupBy(_._1).view.mapValues(_.length).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pagerank: two-node cycle is uniform") {
    val got = PageRank.run(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 0.5) < 1e-12 && math.abs(got(2L) - 0.5) < 1e-12)
  }

  test("pagerank matches the reference power iteration (incl. dangling)") {
    // 4 is dangling (no out-edges); 3 is a hub
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (4L -> 0L)._1 -> 4L, (1L, 2L))
      .map { case (a, b) => (a, b) }.filterNot { case (a, b) => a == b }
    val df = edges.toDF("src", "dst")
    val got = PageRank.run(df, "src", "dst", 12).as[(Long, Double)].collect().toMap
    val ref = refPageRank(edges, 12)
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-9, s"node $k") }
    // hub dominates its feeders
    assert(got(3L) > got(1L) && got(3L) > got(2L))
  }

  test("pagerank conserves total mass at 1") {
    val edges = (1 to 40).map(i => (i.toLong, ((i * 7) % 13).toLong + 1))
      .filterNot { case (a, b) => a == b }
    val total = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 8)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("pagerank local fast path and distributed loop agree") {
    val rnd = new scala.util.Random(97)
    val edges = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filterNot { case (a, b) => a == b }.distinct
    val df = edges.toDF("src", "dst")
    val local = PageRank.run(df, "src", "dst", 10).as[(Long, Double)].collect().toMap
    spark.conf.set("graft.pagerank.localFinishEdges", "0")
    try {
      val dist = PageRank.run(df, "src", "dst", 10).as[(Long, Double)].collect().toMap
      assert(local.keySet == dist.keySet)
      local.foreach { case (k, v) =>
        assert(math.abs(v - dist(k)) < 1e-9, s"node $k: local $v dist ${dist(k)}") }
    } finally spark.conf.unset("graft.pagerank.localFinishEdges")
  }

  test("kmeans recovers designed well-separated clusters") {
    // three orthogonal direction clusters in 4-d with small jitter
    def jitter(base: Array[Double], eps: Double): Array[Double] =
      base.zipWithIndex.map { case (x, i) => x + eps * (if (i % 2 == 0) 1 else -1) }
    val rows = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0.0); base(c) = 1.0
      (i.toLong, jitter(base, 0.02 * ((i / 3) % 3)).map(_.toFloat).toSeq)
    }
    val got = Similarity.kmeansAssign(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3, iters = 6)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    // co-membership: same designed cluster -> same label, different -> different
    val byDesign = (0 until 30).groupBy(_ % 3).view.mapValues(_.map(i => got(i.toLong))).toMap
    byDesign.values.foreach(labels => assert(labels.distinct.size == 1))
    assert(byDesign.values.map(_.head).toSet.size == 3)
  }

  test("kmeans handles k > distinct directions without crashing") {
    val rows = (0 until 6).map(i => (i.toLong, Seq(1.0f, 0.0f)))
    val got = Similarity.kmeansAssign(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 4, iters = 3)
    assert(got.count() == 6)
  }

  // ------------------------------------------------------------ k-core

  test("2-core keeps the triangle and peels the tail chain") {
    import spark.implicits._
    // triangle 1-2-3 with a pendant chain 3-4-5: the chain peels (4 then
    // 5 reaches degree 0... actually 5 first, then 4), the triangle stays
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = graft.graph.KCore.core(edges, "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k-core local finisher and distributed peel agree on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val edges = (0 until 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("a", "b")
    def brute(k: Int): Map[Long, Long] = {
      val adj = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.HashSet[Long]]
      edges.foreach { case (u, v) =>
        adj.getOrElseUpdate(u, scala.collection.mutable.HashSet.empty) += v
        adj.getOrElseUpdate(v, scala.collection.mutable.HashSet.empty) += u
      }
      var changed = true
      while (changed) {
        val doomed = adj.collect { case (n, nb) if nb.size < k => n }.toSeq
        changed = doomed.nonEmpty
        doomed.foreach { n =>
          adj(n).foreach(m => adj.get(m).foreach(_ -= n)); adj.remove(n)
        }
      }
      adj.iterator.map { case (n, nb) => n -> nb.size.toLong }.toMap
    }
    for (k <- Seq(1, 2, 3, 5)) {
      val viaLocal = graft.graph.KCore.core(df, "a", "b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set("graft.kcore.localFinishEdges", "0")
      val viaDist = try graft.graph.KCore.core(df, "a", "b", k)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("graft.kcore.localFinishEdges")
      assert(viaLocal === brute(k), s"local finisher wrong at k=$k")
      assert(viaDist === brute(k), s"distributed peel wrong at k=$k")
    }
  }

  test("k-core of an empty or all-peeled graph is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.graph.KCore.core(empty, "a", "b", 2).count() === 0)
    // a bare path has no 2-core
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(graft.graph.KCore.core(path, "a", "b", 2).count() === 0)
  }
}
