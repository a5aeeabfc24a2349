package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.KCenter

/** Greedy k-center: agreement with a brute local traversal, the
  * non-increasing radius invariant, and diversity over clustered data. */
class KCenterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def bruteGreedy(pts: Seq[(Long, Array[Double])],
                          k: Int): Seq[(Long, Option[Double])] = {
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = pts.minBy(_._1)
    var sel = List((seed._1, Option.empty[Double]))
    var centers = List(seed._2)
    while (sel.size < k) {
      val (id, dist, vec) = pts
        .map(p => (p._1, centers.map(c => d2(p._2, c)).min, p._2))
        // farthest, tiebreak lowest id — matches max(struct(d, -id))
        .maxBy(p => (p._2, -p._1))
      sel = (id, Some(math.sqrt(dist))) :: sel
      centers = vec :: centers
    }
    sel.reverse
  }

  test("matches the brute-force greedy traversal exactly") {
    val rnd = new scala.util.Random(3)
    val pts = (1L to 60L).map(i =>
      (i, Array.fill(4)(rnd.nextDouble() * 10)))
    val df = pts.map { case (i, v) => (i, v.toSeq) }.toDF("id", "vec")
    val got = KCenter.greedy(df, "id", "vec", 8)
      .collect().map(r => (r.getAs[Long]("id"),
        Option(r.getAs[Any]("radius")).map(_.asInstanceOf[Double])))
    val want = bruteGreedy(pts, 8)
      .map { case (i, r) => (i, r.map(x => math.rint(x * 1e6) / 1e6)) }
    assert(got.toList == want.toList)
  }

  test("radius sequence is non-increasing") {
    val rnd = new scala.util.Random(9)
    val df = (1L to 200L).map(i => (i, Seq.fill(8)(rnd.nextDouble())))
      .toDF("id", "vec")
    val rads = KCenter.greedy(df, "id", "vec", 10)
      .collect().drop(1).map(_.getAs[Double]("radius"))
    assert(rads.zip(rads.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("one pick per distinct cluster before any revisit") {
    // 4 tight clusters far apart: the first 4 picks must hit 4 clusters
    val centers = Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0))
    val rnd = new scala.util.Random(5)
    val pts = for {
      (ci, (cx, cy)) <- centers.zipWithIndex.map(_.swap); j <- 1 to 25
    } yield (ci * 1000L + j,
      Seq(cx + rnd.nextDouble(), cy + rnd.nextDouble()))
    val df = pts.toDF("id", "vec")
    val got = KCenter.greedy(df, "id", "vec", 4)
      .collect().map(_.getAs[Long]("id"))
    // the 4 picks' cluster keys (id / 1000) are all distinct
    assert(got.map(_ / 1000).distinct.length == 4)
  }
}
