package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: brute-force prefix-sum equivalence, contiguity,
  * boundary straddling, and partitioning invariance of the distributed
  * scan. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def brute(rows: Seq[(Long, Long)], L: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var run = 0L
    rows.sortBy(_._1).map { case (id, t) =>
      val start = run; run += t
      (id, t, start, start / L, start % L)
    }
  }

  test("packing equals the sequential prefix-sum, boundaries straddle correctly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 500L).map(i => (i, 1L + rnd.nextInt(600).toLong))
    val got = Packing.packSequential(docs.toDF("doc_id", "toks"), "doc_id", "toks", 2048L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == brute(docs, 2048L))
    // straddle sanity: every offset is the previous offset + previous size
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between ${a._1} and ${b._1}")
    }
    // sequences are filled: every seq_id in [0, last] appears
    val seqs = got.map(_._4).distinct.sorted
    assert(seqs == (0L to seqs.last).toList, "hole in sequence ids")
  }

  test("packing is invariant to the input partitioning (1 vs 16 partitions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0L until 300L).map(i => (i, 1L + rnd.nextInt(100).toLong))
    def run(parts: Int) = Packing
      .packSequential(docs.toDF("doc_id", "toks").repartition(parts), "doc_id", "toks", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(run(1) == run(16))
  }

  test("empty input and a single zero-token doc") {
    import spark.implicits._
    assert(Packing.packSequential(
      Seq.empty[(Long, Long)].toDF("doc_id", "toks"), "doc_id", "toks", 64L).count() == 0)
    val one = Packing.packSequential(
      Seq((5L, 0L)).toDF("doc_id", "toks"), "doc_id", "toks", 64L).collect()(0)
    assert((one.getLong(0), one.getLong(2), one.getLong(3), one.getLong(4)) == ((5L, 0L, 0L, 0L)))
  }
}
