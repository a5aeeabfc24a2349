package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Extremes, RobustStats}
import graft.graph.{Hits, Modularity}

/** HITS, Cramér-von Mises, modularity, Gumbel fit (q247–q250). */
class ExtremesHitsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("Hits: the 2×2 textbook case converges to the golden ratio") {
    import spark.implicits._
    // edges 1→X, 1→Y, 2→X: EᵀE = [[2,1],[1,1]], whose principal
    // eigenvector has a_X/a_Y = φ = (1+√5)/2
    val e = Seq((1L, "X"), (1L, "Y"), (2L, "X")).toDF("u", "i")
    val a = Hits.authorities(e, "u", "i")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val phi = (1 + math.sqrt(5)) / 2
    assert(math.abs(a("X") / a("Y") - phi) < 1e-4)
    assert(math.abs(a("X") * a("X") + a("Y") * a("Y") - 1.0) < 1e-4)
  }

  test("Hits: a disconnected low-degree item scores below the hub-backed one") {
    import spark.implicits._
    val e = ((1 to 5).map(u => (u.toLong, "big")) ++
      (1 to 5).map(u => (u.toLong, "side")) :+ (9L, "lone")).toDF("u", "i")
    val a = Hits.authorities(e, "u", "i")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a("big") > a("lone") && a("side") > a("lone"))
  }

  test("cvmTest: identical samples give 0, the disjoint 2+2 case gives 0.375") {
    import spark.implicits._
    val same = (0 until 100).map(i => (((i / 2) % 10).toDouble, i % 2 == 0))
      .toDF("v", "s")
    assert(RobustStats.cvmTest(same, "v", col("s"))
      .collect().head.getDouble(2) == 0.0)
    // s1 = {1,2}, s2 = {3,4}: Σ ct(c1n2−c2n1)² = 4+16+4+0 = 24 →
    // T = 24 / (4²·2·2) = 0.375
    val dis = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("v", "s")
    assert(RobustStats.cvmTest(dis, "v", col("s"))
      .collect().head.getDouble(2) == 0.375)
  }

  test("modularity: two comm-aligned triangles score 0.5, one community 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("s", "d")
    val attrs = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")).toDF("id", "c")
    val r = Modularity.attributePartition(edges, "s", "d", attrs, "id", "c")
      .collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 2 && r.getLong(2) == 6)
    assert(r.getDouble(3) == 0.5)
    val one = attrs.withColumn("c", lit("all"))
    assert(Modularity.attributePartition(edges, "s", "d", one, "id", "c")
      .collect().head.getDouble(3) == 0.0)
  }

  test("gumbelFit: matches the closed-form MoM fit; constant maxima → NULL") {
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      ("a", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0)),
        (i % 5) * 10.0 + 50.0) // daily maxima cycle 50..90
    } ++ (0 until 10).map { i =>
      ("const", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0)), 7.0)
    }
    val out = Extremes.gumbelFit(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    // recompute MoM on the known maxima {50,60,70,80,90}×6
    val xs = (0 until 30).map(i => ((i % 5) * 10.0 + 50.0) * 1e6)
    val n = xs.size.toDouble
    val mean = xs.sum / n
    val v = (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / (n - 1)
    val beta = math.sqrt(v) * 0.7796968012336293
    val mu = mean - 0.5772156649015329 * beta
    assert(math.abs(a.getDouble(2) - math.rint(mu / 1e6 * 1e4) / 1e4) < 1e-9)
    assert(math.abs(a.getDouble(3) - math.rint(beta / 1e6 * 1e4) / 1e4) < 1e-9)
    assert(a.getDouble(4) > a.getDouble(2)) // 30-day return level above μ
    assert(out("const").isNullAt(2) && out("const").isNullAt(4))
  }
}
