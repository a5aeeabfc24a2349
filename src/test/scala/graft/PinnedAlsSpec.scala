package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.PinnedAls

/** Pinned rank-2 ALS: determinism, factor sanity, readout contract. */
class PinnedAlsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ratings = {
    import spark.implicits._
    // two taste blocks: users 1-2 buy items 10/11, users 3-4 buy 20/21;
    // user 5 bridges weakly
    Seq(
      (1L, 10L, 5L), (1L, 11L, 4L), (2L, 10L, 4L), (2L, 11L, 5L),
      (3L, 20L, 5L), (3L, 21L, 4L), (4L, 20L, 4L), (4L, 21L, 5L),
      (5L, 10L, 1L), (5L, 20L, 1L))
      .toDF("user", "item", "rating")
  }

  test("same input, same session: bit-identical factors and neighbors") {
    val a = PinnedAls.itemNeighbors(ratings, 0.1, 5, 10).collect().toSeq
    val b = PinnedAls.itemNeighbors(ratings, 0.1, 5, 10).collect().toSeq
    assert(a == b)
    // anchor (min item = 10) excluded; all other items ranked
    assert(a.map(_.getLong(0)).toSet == Set(11L, 20L, 21L))
    assert(a.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
  }

  test("neighbors are exactly the cosine ranking of the factor table") {
    val f = PinnedAls.itemFactors(ratings, 0.1, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1).toDouble, r.getLong(2).toDouble)))
      .toMap
    val anchor = f.keys.min
    val (a1, a2) = f(anchor)
    val expected = f.toSeq.filter(_._1 != anchor)
      .map { case (it, (v1, v2)) =>
        it -> (v1 * a1 + v2 * a2) /
          (math.sqrt(v1 * v1 + v2 * v2) * math.sqrt(a1 * a1 + a2 * a2))
      }
      .sortBy { case (it, c) => (-c, it) }
      .map { case (it, c) =>
        (it, java.math.BigDecimal.valueOf(c)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
      }
    val got = PinnedAls.itemNeighbors(ratings, 0.1, 5, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("factors land on the 1e-6 grid with positive leading component") {
    val f = PinnedAls.itemFactors(ratings, 0.1, 5).collect()
    assert(f.length == 4)
    // v1 stays positive for this all-positive rating matrix
    assert(f.forall(_.getLong(1) > 0L))
  }
}
