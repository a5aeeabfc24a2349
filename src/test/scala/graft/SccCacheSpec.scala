package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.graph.Scc
import graft.operators.Skew
import graft.sources.ResultCache

/** SCC, result cache, auto-salted join. */
class SccCacheSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def sccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Scc.components(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("SCC separates two cycles joined by a one-way bridge") {
    // cycle {1,2,3}, cycle {10,11}, bridge 3→10 (one-way: no merge)
    val got = sccOf(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 10L), (3L, 10L)))
    assert(Set(1L, 2L, 3L).map(got) == Set(1L))
    assert(Set(10L, 11L).map(got) == Set(10L))
  }

  test("SCC of a DAG is all singletons") {
    val got = sccOf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("SCC: self-loop node is its own component; long path survives") {
    // a 600-node path would blow a recursive DFS — the stack is explicit
    val path = (1L until 600L).map(i => (i, i + 1))
    val got = sccOf(path :+ (700L, 700L))
    assert(got.size == 600 + 1)
    assert(got.values.toSet.size == 601) // all singletons
  }

  test("SCC: local finisher ≡ distributed FW-BW") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 4L), (6L, 1L), (7L, 7L)).toDF("s", "d")
    val local = Scc.components(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    spark.conf.set("graft.scc.localFinishEdges", "0")
    try {
      val dist = Scc.components(edges, "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(local == dist)
    } finally spark.conf.unset("graft.scc.localFinishEdges")
  }

  test("result cache: hit skips recompute, key is semantic") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rescache").toString
    val base = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .filter(col("k") > 10)
    val q1 = base.groupBy((col("k") % 3).as("m")).agg(sum(col("v")).as("s"))
    assert(!ResultCache.isCached(q1, dir))
    val r1 = ResultCache.through(q1, dir).collect().sortBy(_.getLong(0))
    assert(ResultCache.isCached(q1, dir))
    // a semantically identical plan hits the same entry
    val q2 = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .filter(col("k") > 10)
      .groupBy((col("k") % 3).as("m")).agg(sum(col("v")).as("s"))
    assert(ResultCache.isCached(q2, dir))
    val r2 = ResultCache.through(q2, dir).collect().sortBy(_.getLong(0))
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    // a different query misses
    assert(!ResultCache.isCached(q1.filter(col("m") === 0), dir))
  }

  test("auto-salted join matches the plain join; skips salting when flat") {
    import spark.implicits._
    // skewed fact: key 1 carries 90% of rows
    val fact = ((1 to 900).map(_ => 1L) ++ (2 to 101).map(_.toLong))
      .toDF("fk")
    val dim = (1L to 101L).map(i => (i, s"d$i")).toDF("dk", "name")
    val salted = Skew.autoSaltedJoin(fact, dim, "fk", "dk")
      .select("fk", "name").collect().map(r => (r.getLong(0), r.getString(1)))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "name").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(salted.sorted.toSeq == plain.sorted.toSeq)
    // flat keys: decision path returns the plain join (no __salt column)
    val flat = (1L to 100L).toDF("fk")
    assert(Skew.autoSaltedJoin(flat, dim, "fk", "dk").count() == 100)
  }
}
