package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Privacy
import graft.operators.FimSplit
import graft.sim.Anisotropy

/** FIM split, embedding anisotropy, seeded-Laplace release (q273–q275). */
class FimAnisotropySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("fimSplit: spans are lossless, deterministic, and non-ASCII docs are excluded") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "café au lait"), (3L, "x")).toDF("doc_id", "text")
    val out = FimSplit.psm(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // doc 2 non-ASCII
    out.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1))
    }
    val again = FimSplit.psm(docs, "doc_id", "text").collect()
    assert(out.map(_.getString(5)).toSeq == again.map(_.getString(5)).toSeq)
  }

  test("anisotropy: parallel cone = 1, orthogonal pair = 0, antipodal pair = -1") {
    import spark.implicits._
    def run(vs: Seq[Array[Float]]): Double =
      Anisotropy.meanCosine(vs.map(Tuple1(_)).toDF("embedding"), "embedding")
        .collect().head.getDouble(2)
    assert(math.abs(run(Seq(Array(1f, 0f), Array(2f, 0f), Array(3f, 0f))) - 1.0) < 1e-6)
    assert(math.abs(run(Seq(Array(1f, 0f), Array(0f, 1f)))) < 1e-6)
    assert(math.abs(run(Seq(Array(1f, 0f), Array(-1f, 0f))) + 1.0) < 1e-6)
  }

  test("laplaceCounts: reproducible per tag, re-drawn across tags, bounded noise") {
    import spark.implicits._
    val df = (1 to 1000).map(i => Tuple1(if (i % 3 == 0) "a" else "b")).toDF("c")
    val r1 = Privacy.laplaceCounts(df, col("c"), 1.0, "t1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r2 = Privacy.laplaceCounts(df, col("c"), 1.0, "t1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r3 = Privacy.laplaceCounts(df, col("c"), 1.0, "t2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r1 == r2)                    // same release tag → same draw
    assert(r1 != r3)                    // rotated tag → fresh draw
    // hash-uniform Laplace(1) noise is bounded by ~ln(2^32) ≈ 22.2
    assert(math.abs(r1("a") - 333.0) < 25 && math.abs(r1("b") - 667.0) < 25)
  }
}
