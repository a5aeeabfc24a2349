package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Mmr

/** MMR re-ranking: relevance-only at λ=1, diversity forcing at low λ. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // three tight near-duplicate vectors close to the query, one distinct
  // direction further away
  private val vecs = Seq(
    (1L, Seq(1.0, 0.0, 0.0)),
    (2L, Seq(0.999, 0.01, 0.0)),
    (3L, Seq(0.998, 0.02, 0.0)),
    (4L, Seq(0.6, 0.8, 0.0))
  )
  private val q = Array(1.0, 0.05, 0.0)

  test("lambda = 1 is pure relevance order") {
    val df = vecs.toDF("id", "v")
    val got = Mmr.rerank(df, "id", "v", q, 4, 4, lambda = 1.0)
      .select("id").as[Long].collect().toList
    // relevance order = cosine to q descending
    def cos(a: Seq[Double]) = {
      val dot = a.zip(q).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum))
    }
    val want = vecs.sortBy { case (i, v) => (-cos(v), i) }.map(_._1).toList
    assert(got == want)
  }

  test("low lambda promotes the diverse candidate to rank 2") {
    val df = vecs.toDF("id", "v")
    val got = Mmr.rerank(df, "id", "v", q, 4, 2, lambda = 0.3)
      .select("id").as[Long].collect().toList
    // rank 1 = most relevant (id 2 or 1); rank 2 must be the diverse 4,
    // never the near-duplicate of rank 1
    assert(got(1) == 4L, s"diversity pick expected at rank 2, got $got")
  }

  test("mmr scores are non-increasing and selection is k-sized, distinct") {
    val rnd = new scala.util.Random(21)
    val df = (1L to 50L).map(i => (i, Seq.fill(6)(rnd.nextDouble())))
      .toDF("id", "v")
    val rows = Mmr.rerank(df, "id", "v",
      Array.fill(6)(0.5), 20, 8).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("id")).distinct.length == 8)
    val scores = rows.map(_.getAs[Double]("mmr_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b - 1e-9 },
      "greedy MMR objective must be non-increasing")
  }
}
