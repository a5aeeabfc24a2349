package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.analyze.RankStats

/** Dunn's post-hoc pairwise z (q320) and the Jonckheere-Terpstra
  * ordered-alternative test (q321). */
class PostHocJtSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("dunn on three separated groups reproduces hand-computed z") {
    import spark.implicits._
    // A={1,2,3}, B={4,5,6}, C={7,8,9}: mean ranks 2/5/8, no ties →
    // σ² = 9·10/12 = 7.5, se = √(7.5·(1/3+1/3)) = √5,
    // z_AB = (2−5)/√5 = −1.3416, z_AC = −6/√5 = −2.6833
    val rows = Seq("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4, "b" -> 5,
      "b" -> 6, "c" -> 7, "c" -> 8, "c" -> 9)
      .map { case (g, v) => (g, v.toDouble) }
    val r = RankStats.dunn(rows.toDF("g", "v"), col("g"), col("v"))
      .collect()
    assert(r.length == 3)
    val ab = r.find(x => x.getString(0) == "a" && x.getString(1) == "b").get
    assert(ab.getLong(2) == 3 && ab.getLong(3) == 3)
    assert(math.abs(ab.getDouble(4) - 2.0) < 1e-9)
    assert(math.abs(ab.getDouble(5) - 5.0) < 1e-9)
    assert(math.abs(ab.getDouble(6) - (-3.0 / math.sqrt(5.0))) < 1e-4)
    val ac = r.find(x => x.getString(0) == "a" && x.getString(1) == "c").get
    assert(math.abs(ac.getDouble(6) - (-6.0 / math.sqrt(5.0))) < 1e-4)
  }

  test("dunn tie correction shrinks the rank variance") {
    import spark.implicits._
    // all four values equal: every mean rank 2.5, z = 0/0-guard → but
    // σ² = 4·5/12 − (4³−4)/(12·3) = 20/12 − 60/36 = 0 → se = 0 → z null
    val rows = Seq("a" -> 1.0, "a" -> 1.0, "b" -> 1.0, "b" -> 1.0)
    val r = RankStats.dunn(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(math.abs(r.getDouble(4) - 2.5) < 1e-9)
    assert(r.isNullAt(6))
  }

  test("jonckheere on a perfect ordered separation: JT = 12, z = 2.3842") {
    import spark.implicits._
    // g1={1,2} < g2={3,4} < g3={5,6}: U12=U13=U23=4 → JT=12; E=(36−12)/4=6;
    // Var = (6·5·17 − 3·(2·1·9))/72 = 456/72 = 6.3333; z = 6/√6.3333
    val rows = Seq("g1" -> 1, "g1" -> 2, "g2" -> 3, "g2" -> 4,
      "g3" -> 5, "g3" -> 6).map { case (g, v) => (g, v.toDouble) }
    val r = RankStats.jonckheere(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 6)
    assert(math.abs(r.getDouble(2) - 12.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 6.0 / math.sqrt(456.0 / 72.0)) < 1e-4)
  }

  test("jonckheere ties count half: JT matches the brute-force count") {
    import spark.implicits._
    // hand data with cross-group value ties
    val data = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 2.0, "b" -> 2.0,
      "b" -> 3.0, "c" -> 3.0, "c" -> 1.0, "c" -> 4.0)
    val groups = data.map(_._1).distinct.sorted
    val brute2 = (for {
      i <- groups.indices; j <- groups.indices if i < j
      x <- data.filter(_._1 == groups(i)).map(_._2)
      y <- data.filter(_._1 == groups(j)).map(_._2)
    } yield if (x < y) 2L else if (x == y) 1L else 0L).sum
    val r = RankStats.jonckheere(data.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(math.abs(r.getDouble(2) - brute2 / 2.0) < 1e-9)
  }
}
