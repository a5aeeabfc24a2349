package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.RankStats

/** Kruskal-Wallis (q283) and Friedman (q284) k-sample rank tests. */
class KSampleRankSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("kruskal-wallis on three separated groups gives the textbook H = 7.2") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A = {1,2,3}, B = {4,5,6}, C = {7,8,9}: ranks 1..9, R = 6/15/24 →
    // H = 12/90·(36/3 + 225/3 + 576/3) − 30 = 7.2, no ties → h_adj = h
    val rows = Seq("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4, "b" -> 5,
      "b" -> 6, "c" -> 7, "c" -> 8, "c" -> 9)
      .map { case (g, v) => (g, v.toDouble) }
    val r = RankStats.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 9)
    assert(math.abs(r.getDouble(2) - 7.2) < 1e-9)
    assert(math.abs(r.getDouble(3) - 7.2) < 1e-9)
  }

  test("kruskal-wallis tie correction: H = 0.6 raw, 1.0 adjusted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // values 1,1,1,2 (A={1,1}, B={1,2}): avg rank of the three 1s is 2 →
    // R_A = 4, R_B = 6, H = 0.6; tie3 = 24, C = 0.6 → h_adj = 1.0
    val rows = Seq("a" -> 1.0, "a" -> 1.0, "b" -> 1.0, "b" -> 2.0)
    val r = RankStats.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(math.abs(r.getDouble(2) - 0.6) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }

  test("friedman on consistently ordered treatments gives the max Q = 6") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // every block ranks (t1,t2,t3) = (1,2,3) via cell counts 1/2/3 →
    // Q = 12/(3·3·4)·(9+36+81) − 36 = 6 (the n=3, k=3 maximum)
    val rows = for {
      b <- Seq("b1", "b2", "b3")
      (t, c) <- Seq("t1" -> 1, "t2" -> 2, "t3" -> 3)
      _ <- 1 to c
    } yield (b, t)
    val r = RankStats.friedman(rows.toDF("b", "t"), col("b"), col("t"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(2) - 6.0) < 1e-9)
  }

  test("friedman absent cells rank as zero counts, ties averaged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // block b1 has t1 only (t2 absent → count 0); block b2 has both with
    // equal counts (tie → both rank 1.5 doubled 3). Per block doubled
    // ranks: b1 (t1=4, t2=2), b2 (3, 3) → S = (7, 5), n(k+1) = 6 →
    // numerator (k−1)Σ(S−6)² = 1·(1+1) = 2; Σr2² = 16+4+9+9 = 38,
    // denominator 38 − 2·2·9 = 2 → Q = 1.0
    val rows = Seq(("b1", "t1"), ("b2", "t1"), ("b2", "t2"))
    val r = RankStats.friedman(rows.toDF("b", "t"), col("b"), col("t"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }
}
