package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** 2-D skyline: staircase semantics, tie conventions, brute equality. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)]) =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet

  test("hand case: staircase kept, interior dominated") {
    val pts = Seq(
      (1L, 1.0, 5.0), (2L, 2.0, 4.0), (3L, 2.0, 3.0),
      (4L, 3.0, 1.0), (5L, 0.0, 9.0))
    val got = Skyline.skyline2dMax(pts.toDF("id", "x", "y"),
        col("x"), col("y"), Seq("id" -> col("id")))
      .select("id").as[Long].collect().toSet
    assert(got == Set(5L, 1L, 2L, 4L))
    assert(got == brute(pts))
  }

  test("duplicate skyline twins are both kept") {
    val pts = Seq((1L, 2.0, 2.0), (2L, 2.0, 2.0), (3L, 1.0, 1.0))
    val got = Skyline.skyline2dMax(pts.toDF("id", "x", "y"),
        col("x"), col("y"), Seq("id" -> col("id")))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(31)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
    val got = Skyline.skyline2dMax(
        pts.toDF("id", "x", "y").repartition(7),
        col("x"), col("y"), Seq("id" -> col("id")))
      .select("id").as[Long].collect()
    assert(got.toSet == brute(pts))
    assert(got.length == got.distinct.length)
  }
}
