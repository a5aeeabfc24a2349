package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Recommend

/** ALS latent item neighbors (q306). */
class AlsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ratings = {
    import spark.implicits._
    // two disjoint taste groups: users 1-3 buy items 10-12, users 4-6
    // buy items 20-22; anchor (min item 10) should prefer its own group
    val rows = for {
      (us, is) <- Seq((1 to 3, 10 to 12), (4 to 6, 20 to 22))
      u <- us; i <- is
    } yield (u, i, 2.0f)
    rows.toDF("user", "item", "rating")
  }

  test("anchor's latent neighbors favor its co-purchase group") {
    val r = Recommend.alsItemNeighbors(ratings, 4, 10, 0.05, 5).collect()
    assert(r.length == 5)
    r.foreach(x => assert(math.abs(x.getDouble(1)) <= 1.0 + 1e-9))
    val top2 = r.take(2).map(_.getLong(0)).toSet
    assert(top2.subsetOf(Set(11L, 12L)))
  }

  test("seeded ALS readout is reproducible in-session") {
    val a = Recommend.alsItemNeighbors(ratings, 4, 5, 0.1, 5).collect().toSeq
    val b = Recommend.alsItemNeighbors(ratings, 4, 5, 0.1, 5).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
