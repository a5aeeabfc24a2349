package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Bfs, KTruss}

/** BFS hop histogram (q287) and k-truss peel (q288). */
class BfsKTrussSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def edges(e: (Long, Long)*) = {
    import spark.implicits._
    e.toDF("a", "b")
  }

  test("bfs layers a path graph from the minimum id; disconnected part is -1") {
    // 1-2-3-4 chain + separate 5-6: source = 1
    val r = Bfs.hopHistogram(edges((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)), 10)
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r == Seq((-1, 2L), (0, 1L), (1, 1L), (2, 1L), (3, 1L)))
  }

  test("bfs maxHops caps the frontier; beyond-cap nodes count as unreached") {
    val r = Bfs.hopHistogram(edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 2)
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r == Seq((-1, 2L), (0, 1L), (1, 1L), (2, 1L)))
  }

  test("bfs counts each node once despite multiple shortest paths") {
    // diamond 1-2, 1-3, 2-4, 3-4: node 4 reached twice at hop 2
    val r = Bfs.hopHistogram(edges((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), 5)
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r == Seq((0, 1L), (1, 2L), (2, 1L)))
  }

  test("double sweep finds the true diameter of a path graph") {
    // 1-2-3-4: sweep1 from 1 reaches 4 at ecc 3; sweep2 from 4 → ecc 3
    val r = Bfs.doubleSweep(edges((1L, 2L), (2L, 3L), (3L, 4L)), 10)
      .collect().head
    assert(r.getLong(0) == 1 && r.getInt(1) == 3)
    assert(r.getLong(2) == 4 && r.getInt(3) == 3)
  }

  test("double sweep improves on a bad first seed") {
    // star-with-tail: center 1, leaves 2..4, tail 4-5-6. From 1: far is
    // 6 at hop 3; from 6 the true eccentricity is 4 (6-5-4-1-2)
    val r = Bfs.doubleSweep(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L)), 10)
      .collect().head
    assert(r.getLong(0) == 1 && r.getInt(1) == 3)
    assert(r.getLong(2) == 6 && r.getInt(3) == 4)
  }

  test("4-truss keeps K4, peels the pendant edge") {
    // K4 on 1..4 (every edge in 2 triangles) + pendant 4-5
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val r = KTruss.truss(edges(k4 :+ (4L, 5L): _*), "a", "b", 4)
      .collect().head
    assert(r.getInt(0) == 4 && r.getLong(1) == 6 && r.getLong(2) == 4)
  }

  test("4-truss peel cascades: two triangles sharing an edge dissolve") {
    // (1,2),(1,3),(2,3),(2,4),(3,4): only (2,3) has support 2, but
    // dropping its neighbors destroys its triangles → empty fixpoint
    val r = KTruss.truss(
      edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)), "a", "b", 4)
      .collect().head
    assert(r.getLong(1) == 0 && r.getLong(2) == 0)
  }

  test("3-truss keeps any triangle, drops bridges") {
    val r = KTruss.truss(
      edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L)), "a", "b", 3)
      .collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 3)
  }

  test("ktruss fixpoint property on the sf0.001 co-purchase graph") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val e = graft.graph.LinkPrediction
      .coOccurrenceEdges(li, "l_orderkey", "l_partkey", 2L)
    val r = KTruss.truss(e, "a", "b", 3).collect().head
    // independent in-memory peel over the collected edge set must agree
    val all = e.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    var cur = all
    var changed = true
    while (changed) {
      val nbrs = cur.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupMap(_._1)(_._2).map { case (k2, v) => k2 -> v.toSet }
      val kept = cur.filter { case (a, b) =>
        (nbrs(a) & nbrs(b)).size >= 1
      }
      changed = kept != cur
      cur = kept
    }
    assert(r.getLong(1) == cur.size.toLong)
    assert(r.getLong(2) == cur.flatMap(p => Seq(p._1, p._2)).size.toLong)
  }

  test("ktruss local finisher matches the distributed peel exactly") {
    // random-ish co-occurrence style graph with triangles and bridges
    val rnd = new scala.util.Random(11)
    val es = (0 until 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(p => p._1 != p._2)
    val df = edges(es: _*)
    val local = KTruss.truss(df, "a", "b", 4).collect().head
    spark.conf.set("graft.ktruss.localFinishEdges", "0") // force distributed
    try {
      val dist = KTruss.truss(df, "a", "b", 4).collect().head
      assert(local == dist, s"local $local vs distributed $dist")
    } finally spark.conf.unset("graft.ktruss.localFinishEdges")
  }
}
