package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.graph.PersonalizedPageRank
import graft.sim.ProductQuantize

/** Personalized PageRank + product quantization. */
class PprPqSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ranksOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
                      iters: Int = 10): Map[Long, Double] = {
    import spark.implicits._
    PersonalizedPageRank.run(edges.toDF("s", "d"), "s", "d", seeds, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("PPR concentrates mass near the seed; unreachable nodes get zero") {
    // chain 1→2→3; separate chain 10→11 (unreachable from seed 1).
    // 30 iterations: the dangling→seed feedback ring decays by ~0.61 per
    // 3 rounds, so 10 would not yet pin the ordering
    val got = ranksOf(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L), iters = 30)
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    assert(got(10L) == 0.0 && got(11L) == 0.0)
  }

  test("PPR total mass stays ~1 and follows the closed-form recurrence") {
    val got = ranksOf(Seq((1L, 2L), (2L, 1L), (2L, 3L)), Seq(1L, 2L))
    val total = got.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass $total")
  }

  test("PPR: local ≡ distributed at 1e-9") {
    import spark.implicits._
    val edges = (1L to 30L).map(i => (i, i % 7 + 1)).toDF("s", "d")
    val local = PersonalizedPageRank.run(edges, "s", "d", Seq(1L), 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set("graft.pagerank.localFinishEdges", "0")
    try {
      val dist = PersonalizedPageRank.run(edges, "s", "d", Seq(1L), 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(local.keySet == dist.keySet)
      local.foreach { case (k, v) =>
        assert(math.abs(v - dist(k)) < 1e-9, s"node $k: $v vs ${dist(k)}")
      }
    } finally spark.conf.unset("graft.pagerank.localFinishEdges")
  }

  test("PQ: larger codebooks reconstruct better; rerun is identical") {
    import spark.implicits._
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(j => ((i * 31 + j * 7) % 23 - 11).toDouble / 4.0))
    }.toDF("id", "v")
    def totalMse(k: Int): Double = {
      val cb = ProductQuantize.train(vecs, "id", "v", m = 4, k = k, iters = 4)
      ProductQuantize.mseReport(vecs, "id", "v", cb)
        .agg(sum(col("mse"))).head().getDouble(0)
    }
    val m1 = totalMse(1)
    val m8 = totalMse(8)
    assert(m8 < m1, s"k=8 mse $m8 should beat k=1 mse $m1")
    assert(totalMse(8) == m8) // deterministic rerun
  }

  test("pinned PQ equals a local integer-Lloyd reference and improves with k") {
    import spark.implicits._
    val raw = (0L until 120L).map { i =>
      (i, Array.tabulate(8)(j => ((i * 13 + j * 5) % 19 - 9).toDouble / 7.0))
    }
    val vecs = raw.toDF("id", "v")
    val m = 2; val k = 3; val iters = 4
    val got = ProductQuantize.trainPinned(vecs, "id", "v", m, k, iters)
    // local reference: the same pinned recurrence, plain Scala
    def raL(x: Double): Long = if (x >= 0) math.round(x) else -math.round(-x)
    val subDim = 8 / m
    val x6 = raw.map { case (_, v) => v.map(x => raL(x * 1e6)) }
    var cents = Array.tabulate(m, k)((s, c) =>
      x6(c).slice(s * subDim, (s + 1) * subDim))
    for (_ <- 1 to iters) {
      val sums = Array.fill(m, k, subDim)(0L)
      val cnts = Array.fill(m, k)(0L)
      x6.foreach { v =>
        for (s <- 0 until m) {
          val best = (0 until k).minBy { c =>
            (0 until subDim).map { i =>
              val d = v(s * subDim + i) - cents(s)(c)(i); d * d
            }.sum
          }
          for (i <- 0 until subDim) sums(s)(best)(i) += v(s * subDim + i)
          cnts(s)(best) += 1L
        }
      }
      cents = Array.tabulate(m, k)((s, c) =>
        if (cnts(s)(c) > 0)
          Array.tabulate(subDim)(i => raL(sums(s)(c)(i).toDouble / cnts(s)(c)))
        else cents(s)(c))
    }
    assert(got.map(_.map(_.toList).toList).toList ==
      cents.map(_.map(_.toList).toList).toList)
    // readout matches a local recompute and shrinks as k grows
    def mseOf(kk: Int): Map[Int, Double] = {
      val cb = ProductQuantize.trainPinned(vecs, "id", "v", m, kk, iters)
      ProductQuantize.msePinnedReport(vecs, "id", "v", cb)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    val mse3 = mseOf(3)
    val localMse = (0 until m).map { s =>
      val errs = x6.map { v =>
        (0 until k).map { c =>
          (0 until subDim).map { i =>
            val d = v(s * subDim + i) - cents(s)(c)(i); d * d
          }.sum
        }.min
      }
      s -> BigDecimal(errs.sum.toDouble / errs.length / 1e12 / subDim)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    localMse.foreach { case (s, e) => assert(mse3(s) == e, s"sub $s") }
    val mse8 = mseOf(8)
    assert(mse8.values.sum < mse3.values.sum)
  }

  test("PQ encode emits one code per subspace within codebook range") {
    import spark.implicits._
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(j => (i + j).toDouble))
    }.toDF("id", "v")
    val cb = ProductQuantize.train(vecs, "id", "v", m = 2, k = 4, iters = 3)
    val codes = ProductQuantize.encode(vecs, "id", "v", cb)
      .collect().map(_.getSeq[Int](1))
    assert(codes.forall(_.length == 2))
    assert(codes.flatten.forall(c => c >= 0 && c < 4))
  }
}
