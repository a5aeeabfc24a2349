package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** SemDeDup semantic dedup: brute-force equivalence on a designed
  * cluster layout, the keep-one-per-component contract, and the
  * double-array generalization of the native cosine expression. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def cos(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until math.min(a.length, b.length)).foreach { i =>
      dot += a(i) * b(i); na += a(i).toDouble * a(i); nb += b(i) * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("designed clusters: near-dups collapse per component, min id kept") {
    import spark.implicits._
    // two geometric clusters on orthogonal axes; labels match geometry so
    // centroid assignment is unambiguous. ids 1,2,3 are near-identical
    // (pairwise cos ~1); 4 is same cluster but rotated below tau; 10,11
    // near-identical in the second cluster.
    def v(x: Double, y: Double, z: Double) =
      Array(x, y, z).map(_.toFloat) ++ Array.fill(5)(0.0f)
    val rows = Seq(
      (1L, v(1, 0.01, 0), 0), (2L, v(1, 0.012, 0), 0), (3L, v(0.99, 0.01, 0), 0),
      (4L, v(0.5, 0.86, 0), 0), // same label, cos to the x-axis trio ~0.5 < tau
      (10L, v(0, 0.01, 1), 1), (11L, v(0, 0.012, 1), 1))
    val out = Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label", 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((0L, 1L, 1L)))
    assert(out(2L) == ((0L, 1L, 0L)))
    assert(out(3L) == ((0L, 1L, 0L)))
    assert(out(4L)._3 == 1L && out(4L)._2 == 4L) // below tau: own component
    assert(out(10L) == ((1L, 10L, 1L)))
    assert(out(11L) == ((1L, 10L, 0L)))
  }

  test("random vectors: exactly one keep per component, keep is the min id") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0L until 120L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat), (i % 4).toInt)
    }
    val out = Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length == 120)
    out.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._3 == 1L) == 1, s"component $comp")
      assert(members.find(_._3 == 1L).get._1 == members.map(_._1).min, s"component $comp")
      assert(comp == members.map(_._1).min, s"component $comp labels by min id")
    }
  }

  test("native cosine accepts double arrays and matches the HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat),
        Array.fill(16)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "fv", "dv")
    val got = df.select(col("id"),
        Similarity.cosine(col("fv").cast("array<double>"), col("dv")).as("c1"),
        Similarity.cosineHof(col("fv"), col("dv")).as("c2"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id ${r.getLong(0)}")
    }
  }

  test("a zero-norm (NaN-cosine) centroid never wins the assignment") {
    import spark.implicits._
    // class 0's members cancel to a zero centroid → cosine NaN for every
    // vector; class 1 has a real centroid. Every vector must assign to
    // class 1 (NaN deprioritized), not to the degenerate centroid.
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val rows = Seq(
      (1L, v(1, -1), 0), (2L, v(-1, 1), 0), // mean = (0, 0)
      (10L, v(1, 0), 1), (11L, v(1, 0.01), 1))
    val out = Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label", 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 4)
    assert(out.values.forall(_ == 1L), s"all assigned to the real centroid, got $out")
  }
}
