package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.RandomProjection

/** JL random projection + distortion audit (q400). */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def vecs(n: Int, d: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, Array.fill(d)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("projection is a pure function of (id, tag): partitioning-invariant") {
    val df = vecs(60, 32)
    val a = RandomProjection.project(df, "vec_id", "embedding", 8, "t")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = RandomProjection.project(df.repartition(13), "vec_id", "embedding", 8, "t")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == b)
    assert(a.size == 60 * 8)
  }

  test("distortion: mean ratio ≈ 1 and spread shrinks as k grows") {
    val df = vecs(400, 64)
    def audit(k: Int) = {
      val r = RandomProjection.distortionAudit(df, "vec_id", "embedding", k, "t")
        .collect().head
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val (n8, m8, lo8, hi8) = audit(8)
    val (n32, m32, lo32, hi32) = audit(32)
    assert(n8 == 399 && n32 == 399)
    assert(math.abs(m8 - 1.0) < 0.15, s"k=8 mean $m8")
    assert(math.abs(m32 - 1.0) < 0.08, s"k=32 mean $m32")
    assert(hi32 - lo32 < hi8 - lo8,
      s"spread must shrink in k: k8 [$lo8,$hi8] vs k32 [$lo32,$hi32]")
    assert(lo32 > 0.3 && hi32 < 2.5)
  }
}
