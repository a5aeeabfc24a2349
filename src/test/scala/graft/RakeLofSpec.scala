package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Experiment
import graft.sim.Lof
import graft.text.Rake

/** RAKE keywords, Simpson's-paradox detector, LOF (q267–q269). */
class RakeLofSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("rake: hand-scored two-doc corpus") {
    import spark.implicits._
    // phrases: "alpha beta" and "alpha" → alpha: freq 2, deg 3 (score
    // 1.5); beta: freq 1, deg 2 (score 2) → phrase scores 3.5 / 1.5
    val docs = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val out = Rake.topPhrases(docs, "doc_id", "text", Seq("the"), 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("alpha beta", 1L, 3.5), ("alpha", 1L, 1.5)))
  }

  test("rake: stopwords split runs and long runs are dropped") {
    import spark.implicits._
    val docs = Seq((1L, "red fox of the lazy dog"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val out = Rake.topPhrases(docs, "doc_id", "text",
      Seq("the", "of"), 3, 10).collect().map(_.getString(0)).toSet
    // "of the" splits doc 1 into two 2-token phrases; doc 2's 4-token
    // run exceeds maxLen=3 and is dropped entirely
    assert(out == Set("red fox", "lazy dog"))
  }

  test("simpsonsCheck: the textbook weighted reversal flags, a uniform effect does not") {
    import spark.implicits._
    // arm by the engine's own md5 hash — recompute it here to place users
    def arm(u: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map(b => f"$b%02x").mkString, 16) % 2 == 0
    }
    val aU = (1L to 200L).filter(arm).take(10)
    val bU = (1L to 200L).filterNot(arm).take(10)
    // A: 9 rows in low stratum (v=1) + 1 in high (v=10); B: 1 low (0.9)
    // + 9 high (9.9): A wins EVERY stratum, B wins pooled
    val rows =
      aU.take(9).map(u => (u, "low", 1.0)) ++ Seq((aU(9), "high", 10.0)) ++
      Seq((bU.head, "low", 0.9)) ++ bU.tail.take(9).map(u => (u, "high", 9.9))
    val df = rows.toDF("user_id", "event_type", "value")
    val r = Experiment.simpsonsCheck(df, "user_id", "value", col("event_type"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getDouble(1) < 0)
    assert(r.getLong(2) == 0 && r.getLong(3) == 2 && r.getBoolean(4))
    // uniform effect: A beats B everywhere AND pooled → no paradox
    val uni = (aU.take(4).map(u => (u, "low", 2.0)) ++
      aU.slice(4, 8).map(u => (u, "high", 5.0)) ++
      bU.take(4).map(u => (u, "low", 1.0)) ++
      bU.slice(4, 8).map(u => (u, "high", 4.0))).toDF("user_id", "event_type", "value")
    val ur = Experiment.simpsonsCheck(uni, "user_id", "value", col("event_type"))
      .collect().head
    assert(ur.getLong(2) == 2 && ur.getLong(3) == 0 && !ur.getBoolean(4))
  }

  test("lof: the stray point tops the ranking; a deep-cluster point sits near 1") {
    import spark.implicits._
    val cluster = Seq(
      (1L, Array(1.0f, 0.00f)), (2L, Array(1.0f, 0.02f)),
      (3L, Array(1.0f, -0.02f)), (4L, Array(1.0f, 0.04f)),
      (5L, Array(1.0f, -0.04f)))
    val stray = Seq((9L, Array(0.0f, 1.0f)))
    val df = (cluster ++ stray).toDF("vec_id", "embedding")
    val out = Lof.bruteTop(df, "vec_id", "embedding", 2, 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.maxBy(_._2)._1 == 9L)
    assert(out(9L) > 10.0)        // density ratio vs the tight cluster
    // every cluster point sits orders of magnitude below the stray
    assert((out - 9L).values.forall(_ < 3.0))
  }

  test("lof: identical duplicate points survive the zero-distance guard") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 0f)), (2L, Array(1.0f, 0f)),
      (3L, Array(1.0f, 0f)), (4L, Array(0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Lof.bruteTop(df, "vec_id", "embedding", 2, 4).collect()
    assert(out.length == 4 && out.forall(!_.isNullAt(3)))
  }

  test("bucketed lof ≡ brute lof on separated clusters (seeds cover every cluster)") {
    import spark.implicits._
    // 4 well-separated direction clusters on orthogonal axes; ids 1..4
    // are one member per cluster, so the 4 lowest-id seeds are exactly
    // one seed per cluster and nearest-seed assignment recovers the true
    // partition. Every point's 3 nearest neighbors live in its own
    // cluster → the bucketed candidate frame contains the full brute
    // kNN and the two rankings must agree EXACTLY, row for row.
    val rnd = new scala.util.Random(11)
    val pts = (0 until 48).map { i =>
      val c = i % 4                       // ids 1..4 = clusters 0..3
      val v = new Array[Float](8)
      v(c * 2) = 1.0f
      v(c * 2 + 1) = (rnd.nextDouble() * 0.05).toFloat  // in-cluster spread
      (i + 1L, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val brute = Lof.bruteTop(df, "vec_id", "embedding", 3, 48)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val bucketed = Lof.bucketedTop(df, "vec_id", "embedding", 3, 48, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(brute.toSeq == bucketed.toSeq,
      s"bucketed must equal brute on separated clusters:\n brute   : ${brute.take(5).toSeq}\n bucketed: ${bucketed.take(5).toSeq}")
  }

  test("bucketed lof: null/empty vectors are dropped, even among the seed ids") {
    import spark.implicits._
    // id 1 (a would-be seed: lowest id) carries a NULL vector and id 2
    // an empty one — both must be silently excluded from seeding AND
    // scoring (regression: the null seed NPE'd the driver-side seed
    // decode; non-seed nulls silently vanished from PinnedSeedArgmin)
    val good = (3 to 14).map(i => (i.toLong,
      Array(1.0f, (i * 0.01).toFloat, if (i % 2 == 0) 0.5f else 0f)))
    val df = (Seq((1L, null.asInstanceOf[Array[Float]]), (2L, Array.empty[Float])) ++ good)
      .toDF("vec_id", "embedding")
    val out = Lof.bucketedTop(df, "vec_id", "embedding", 3, 20, 2).collect()
    assert(out.length == good.size, s"expected ${good.size} scored rows, got ${out.length}")
    assert(out.forall(r => r.getLong(0) >= 3L && !r.isNullAt(3)))
  }

  test("bucketed lof: undersized buckets normalize by their true neighbor count") {
    import spark.implicits._
    // 2 seeds; cluster B has only 3 points → k=5 exceeds the bucket, so
    // its points carry nk=2 neighborhoods; everything must stay non-null
    val pts =
      Seq((1L, Array(1.0f, 0f, 0f)), (2L, Array(0f, 1.0f, 0f))) ++
      (3 to 12).map(i => (i.toLong, Array(1.0f, (i * 0.01).toFloat, 0f))) ++
      Seq((20L, Array(0f, 1.0f, 0.05f)), (21L, Array(0f, 1.0f, -0.04f)))
    val out = Lof.bucketedTop(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 5, 20, 2).collect()
    assert(out.length == pts.size)
    assert(out.forall(r => !r.isNullAt(3) && r.getDouble(3) > 0))
  }
}
