package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Experiment
import graft.sim.{Anisotropy, Lof}

/** kNN hubness, Calinski-Harabasz, permutation test (q279–q281). */
class HubnessChSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("hubnessReport: a central hub dominates k-occurrences; a symmetric ring has none") {
    import spark.implicits._
    // four spokes tilted off the center in DIFFERENT planes: each spoke
    // is ~26° from the center but ≥ 36° from any other spoke, so with
    // k=1 every spoke picks the center → N_1(center) = 4
    val hub = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.44f, 0f)), (2L, Array(0.9f, -0.44f, 0f)),
      (3L, Array(0.9f, 0f, 0.44f)), (4L, Array(0.9f, 0f, -0.44f)))
      .toDF("vec_id", "embedding")
    val h = Lof.hubnessReport(hub, "vec_id", "embedding", 1).collect().head
    assert(h.getLong(0) == 5 && h.getLong(2) == 4)   // max_nk: the hub
    assert(h.getDouble(4) > 0.5)                      // right-skewed
  }

  test("calinskiHarabasz: separated clusters score far above one smeared cloud") {
    import spark.implicits._
    def mk(rows: Seq[(Int, Array[Float])]) = rows.toDF("label", "embedding")
    val tight = mk(Seq(
      (0, Array(1f, 0f)), (0, Array(0.99f, 0.01f)), (0, Array(1.01f, -0.01f)),
      (1, Array(0f, 1f)), (1, Array(0.01f, 0.99f)), (1, Array(-0.01f, 1.01f))))
    val smear = mk(Seq(
      (0, Array(1f, 0f)), (0, Array(0f, 1f)), (0, Array(0.5f, 0.5f)),
      (1, Array(0.9f, 0.1f)), (1, Array(0.1f, 0.9f)), (1, Array(0.45f, 0.55f))))
    val ct = Anisotropy.calinskiHarabasz(tight, "label", "embedding")
      .collect().head
    val cs = Anisotropy.calinskiHarabasz(smear, "label", "embedding")
      .collect().head
    assert(ct.getLong(0) == 6 && ct.getLong(1) == 2 && ct.getLong(2) == 2)
    assert(ct.getDouble(3) > 100 * cs.getDouble(3))
  }

  test("permutationTest: a genuine arm effect is significant, pure noise is not") {
    import spark.implicits._
    def arm(u: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map(b => f"$b%02x").mkString, 16) % 2 == 0
    }
    // effect: arm-0 units earn 10, arm-1 earn 1
    val eff = (1L to 400L).map(u =>
      (u, "purchase", if (arm(u)) 10.0 else 1.0))
      .toDF("user_id", "event_type", "value")
    val r = Experiment.permutationTest(eff, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    assert(math.abs(r.getDouble(2) - 9.0) < 0.2)
    assert(r.getDouble(3) <= 0.00991) // no permutation reaches it (6-dp round of 1/101)
    // noise: value independent of arm → p far from significant
    val noise = (1L to 400L).map(u => (u, "purchase", (u % 7).toDouble))
      .toDF("user_id", "event_type", "value")
    val n = Experiment.permutationTest(noise, "user_id", "value",
      col("event_type") === "purchase", 100).collect().head
    assert(n.getDouble(3) > 0.05)
  }

  test("bucketed hubness matches brute on separated clusters; runs the bucketed frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val pts = (0 until 48).map { i =>
      val c = i % 4
      val v = new Array[Float](8)
      v(c * 2) = 1.0f
      v(c * 2 + 1) = (rnd.nextDouble() * 0.05).toFloat
      (i + 1L, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val brute = Lof.hubnessReport(df, "vec_id", "embedding", 3).collect().head
    val bucketed = Lof.hubnessReportBucketed(df, "vec_id", "embedding", 3, 4)
      .collect().head
    assert(brute.toSeq == bucketed.toSeq,
      s"bucketed hubness must equal brute on separated clusters:\n $brute vs $bucketed")
  }
}
