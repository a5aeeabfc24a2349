package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.graph.LinkPrediction

/** Degree assortativity and Adamic-Adar link prediction on graphs with
  * hand-computable answers. */
class LinkPredictionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("co-occurrence edges: distinct sorted pairs per basket") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 10L), // duplicate pair in other order
      (3L, 40L), (3L, 40L), // repeated item, no self-pair
      (4L, 50L) // singleton basket, no pair
    ).toDF("g", "item")
    val got = LinkPrediction.coOccurrenceEdges(df, "g", "item")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("assortativity of a star is -1") {
    // K(1,3): the hub (deg 3) only meets leaves (deg 1) — perfect
    // disassortativity
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val row = LinkPrediction.degreeAssortativity(edges).head
    assert(row.getAs[Long]("n_ends") == 6L)
    assert(math.abs(row.getAs[Double]("assortativity") - (-1.0)) < 1e-9)
  }

  test("assortativity of a degree-regular graph is NULL (zero variance)") {
    // 4-cycle: every node degree 2
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("a", "b")
    val row = LinkPrediction.degreeAssortativity(edges).head
    assert(row.isNullAt(row.fieldIndex("assortativity")))
  }

  test("adamic-adar on a 4-cycle: the two diagonals, score 2/ln 2") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("a", "b")
    val got = LinkPrediction.adamicAdar(edges, 10)
      .select("u", "v", "common", "aa_score")
      .as[(Long, Long, Long, Double)].collect().toList
    // quantized: 2 * round(1e12 / ln 2) / 1e12, 6 dp
    val expected = math.floor(2 * math.round(1e12 / math.log(2.0)) / 1e6 + 0.5) / 1e6
    assert(got == List((0L, 2L, 2L, expected), (1L, 3L, 2L, expected)))
  }

  test("adamic-adar rarity weighting: scarce shared neighbor outranks hub") {
    // z1 connects (1,2) and nothing else (deg 2); hub z2 connects (3,4)
    // but also 5 other spokes (deg 7) — pair (1,2) must outrank (3,4)
    val hubEdges = Seq((100L, 3L), (100L, 4L)) ++ (10L to 14L).map(100L -> _)
    val edges = (Seq((99L, 1L), (99L, 2L)) ++ hubEdges).toDF("a", "b")
    val got = LinkPrediction.adamicAdar(edges, 3)
      .select("u", "v").as[(Long, Long)].collect().toList
    assert(got.head == ((1L, 2L)))
    assert(got.contains((3L, 4L)))
  }
}
