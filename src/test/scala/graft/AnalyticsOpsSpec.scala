package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{Drift, Experiment, Funnel, Profile, QuantileCut}

/** Round-7 analytics additions: A/B experiment readout, time-bounded
  * funnel, embedding drift, equi-width histogram, quantile
  * normalization — each pinned against an independent in-test
  * reimplementation (never against itself). */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** The portable unit hash reimplemented independently of
    * [[graft.operators.Sharding.hash32]]: first 8 hex digits of md5. */
  private def refHash32(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------ experiment

  test("abReport matches an independent Scala computation end to end") {
    import spark.implicits._
    // 8 users, deterministic metric/conversion pattern
    val events = (1 to 8).flatMap { u =>
      Seq((u.toLong, "purchase", u * 1.25),
        (u.toLong, "purchase", 0.5),
        (u.toLong, if (u % 3 == 0) "signup" else "view", 1.0))
    }.toDF("user_id", "event_type", "value")
    val got = Experiment.abReport(events, "user_id", "value",
      col("event_type") === "purchase", col("event_type") === "signup")
      .collect().head
    // reference: same semantics, straight Scala
    case class U(variant: String, metric: Double, conv: Long)
    val units = (1 to 8).map { u =>
      val v = if (refHash32(u.toString) % 2 == 0) "A" else "B"
      U(v, u * 1.25 + 0.5, if (u % 3 == 0) 1L else 0L)
    }
    def arm(v: String) = units.filter(_.variant == v)
    val (a, b) = (arm("A"), arm("B"))
    assert(got.getAs[Long]("n_a") == a.size && got.getAs[Long]("n_b") == b.size)
    assert(got.getAs[Long]("conv_a") == a.map(_.conv).sum)
    assert(got.getAs[Long]("conv_b") == b.map(_.conv).sum)
    def mean(xs: Seq[U]) = xs.map(_.metric).sum / xs.size
    def svar(xs: Seq[U]) = {
      val m = mean(xs)
      xs.map(x => (x.metric - m) * (x.metric - m)).sum / (xs.size - 1)
    }
    // reported means are presentation-rounded to 4 dp
    assert(math.abs(got.getAs[Double]("mean_a") - mean(a)) < 1e-4)
    assert(math.abs(got.getAs[Double]("mean_b") - mean(b)) < 1e-4)
    val t = (mean(a) - mean(b)) / math.sqrt(svar(a) / a.size + svar(b) / b.size)
    assert(math.abs(got.getAs[Double]("welch_t") - t) < 1e-3)
    val (ca, cb) = (a.map(_.conv).sum.toDouble, b.map(_.conv).sum.toDouble)
    val (na, nb) = (a.size.toDouble, b.size.toDouble)
    val det = ca * (nb - cb) - cb * (na - ca)
    val den = na * nb * (ca + cb) * (na + nb - ca - cb)
    val chi2 = (na + nb) * det * det / den
    assert(math.abs(got.getAs[Double]("chi2") - chi2) < 1e-3)
  }

  test("abReport is invariant under repartitioning") {
    import spark.implicits._
    val events = (1 to 40).map(i =>
      ((i % 11).toLong, if (i % 4 == 0) "purchase" else "signup", i * 0.37))
      .toDF("user_id", "event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Experiment.abReport(df, "user_id", "value",
        col("event_type") === "purchase", col("event_type") === "signup")
        .collect().head.toSeq
    assert(run(events) == run(events.repartition(13)))
  }

  // --------------------------------------------------------- window funnel

  test("windowFunnel drops completions past the deadline, funnel keeps them") {
    import spark.implicits._
    val events = Seq(
      // user 1: full chain inside 1h
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 10:10:00")),
      (1L, "c", ts("2024-01-01 10:20:00")),
      // user 2: step b lands after the 1h deadline
      (2L, "a", ts("2024-01-01 10:00:00")),
      (2L, "b", ts("2024-01-01 11:30:00")),
      (2L, "c", ts("2024-01-01 11:40:00")),
      // user 3: b inside, c outside the window
      (3L, "a", ts("2024-01-01 10:00:00")),
      (3L, "b", ts("2024-01-01 10:50:00")),
      (3L, "c", ts("2024-01-01 11:30:00")),
      // user 4: b simultaneous with a — strict ordering rejects it
      (4L, "a", ts("2024-01-01 10:00:00")),
      (4L, "b", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val w = Funnel.windowFunnel(events, "user_id", "event_type", "ts",
      Seq("a", "b", "c"), windowSeconds = 3600L)
      .orderBy("step_idx").collect()
    assert(w.map(_.getAs[Long]("n_users")).toSeq == Seq(4L, 2L, 1L))
    // the unbounded funnel admits users 2 and 3's late completions
    val f = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("a", "b", "c")).orderBy("step_idx").collect()
    assert(f.map(_.getAs[Long]("n_users")).toSeq == Seq(4L, 3L, 3L))
  }

  // ------------------------------------------------------- embedding drift

  test("embeddingDrift: identical snapshots give zero delta, cosine 1") {
    import spark.implicits._
    val vecs = (1 to 10).map(i =>
      (i.toLong, Array(0.1f * i, -0.2f * i, 0.05f))).toDF("id", "v")
    val d = Drift.embeddingDrift(vecs, vecs, "v").collect()
    assert(d.length == 3)
    d.foreach { r =>
      assert(r.getAs[Double]("delta") == 0.0)
      assert(r.getAs[Double]("centroid_cos") == 1.0)
    }
  }

  test("embeddingDrift detects a constant shift in one dimension") {
    import spark.implicits._
    val base = (1 to 20).map(i => (i.toLong, Array(1.0f, 2.0f))).toDF("id", "v")
    val cur = (1 to 20).map(i => (i.toLong, Array(1.0f, 3.0f))).toDF("id", "v")
    val d = Drift.embeddingDrift(base, cur, "v").orderBy("dim").collect()
    assert(d(0).getAs[Double]("delta") == 0.0)
    assert(d(1).getAs[Double]("delta") == 1.0)
    assert(d(0).getAs[Double]("centroid_cos") < 1.0)
  }

  // ------------------------------------------------------------- histogram

  test("equiWidthHistogram: hand-computed bins, max value stays inside") {
    import spark.implicits._
    val df = (0 until 10).map(i => ("g", i.toDouble)).toDF("g", "x")
    val h = Profile.equiWidthHistogram(df, "x", 5, Seq("g"))
      .orderBy("bin").collect()
    assert(h.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"))).toSeq ==
      Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
    // edges span [0, 9] in value space
    assert(h.head.getAs[Double]("bin_lo") == 0.0)
    assert(h.last.getAs[Long]("bin") == 4L)
  }

  test("equiWidthHistogram: constant column degenerates to one bin") {
    import spark.implicits._
    val df = (1 to 7).map(_ => Tuple1(3.5)).toDF("x")
    val h = Profile.equiWidthHistogram(df, "x", 10).collect()
    assert(h.length == 1 && h.head.getAs[Long]("bin") == 0L &&
      h.head.getAs[Long]("n") == 7L)
  }

  test("equiWidthHistogram is invariant under repartitioning") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("t" + (i % 3), math.sin(i) * 100))
      .toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.equiWidthHistogram(d, "x", 16, Seq("g"))
        .orderBy("g", "bin").collect().toSeq
    assert(run(df) == run(df.repartition(11)))
  }

  // ---------------------------------------------------- quantile normalize

  test("quantileNormalize: a single group maps onto itself (identity)") {
    import spark.implicits._
    val df = (1 to 9).map(i => (i.toLong, "s", i * 1.5)).toDF("id", "src", "x")
    val n = QuantileCut.quantileNormalize(df, "src", "x", "id", "x_norm")
      .collect()
    n.foreach(r => assert(r.getAs[Double]("x_norm") == r.getAs[Double]("x")))
  }

  test("quantileNormalize maps group ranks onto global order positions") {
    import spark.implicits._
    // group a: 3 rows, group b: 5 rows; global N = 8
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 1.0), (5L, "b", 2.0), (6L, "b", 3.0), (7L, "b", 4.0),
      (8L, "b", 5.0)).toDF("id", "src", "x")
    val globalSorted = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 30.0)
    def expect(r: Long, ng: Long): Double = {
      val idx = 1 + ((r - 1) * 7 * 2 + (ng - 1)) / ((ng - 1) * 2)
      globalSorted((idx - 1).toInt)
    }
    val got = QuantileCut.quantileNormalize(df, "src", "x", "id", "x_norm")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("x_norm"))
      .toMap
    // group a ranks 1..3 of 3 → global idx 1, round(3.5)=4, 8
    assert(got(1L) == expect(1, 3) && got(1L) == 1.0)
    assert(got(2L) == expect(2, 3))
    assert(got(3L) == expect(3, 3) && got(3L) == 30.0)
    // group b rank 1/5 → global min, rank 5/5 → global max
    assert(got(4L) == 1.0 && got(8L) == 30.0)
  }

  test("CUPED: variance reduction equals the x-y correlation squared") {
    import spark.implicits._
    // y strongly predicted by pre-period x → big reduction
    val rows = (1 to 200).flatMap { u =>
      val base = (u * 13 % 50).toDouble
      Seq((u.toLong, ts("2024-01-05 00:00:00"), "view", base),
        (u.toLong, ts("2024-01-20 00:00:00"), "view", base + (u % 5)))
    }
    val ev = rows.toDF("user_id", "ts", "event_type", "value")
    val r = Experiment.cuped(ev, "user_id", "value",
      col("ts") < lit("2024-01-16").cast("timestamp"),
      col("ts") >= lit("2024-01-16").cast("timestamp")).collect().head
    assert(r.getLong(0) == 200)
    assert(r.getAs[Double]("var_reduction") > 0.9, s"reduction ${r.getAs[Double]("var_reduction")}")
    // adjusted means move toward each other when arms differ only via x
    assert(math.abs(r.getAs[Double]("mean_adj_a") - r.getAs[Double]("mean_adj_b")) <=
      math.abs(r.getAs[Double]("mean_y_a") - r.getAs[Double]("mean_y_b")) + 0.5)
  }

  test("required sample size: bigger observed gaps need fewer users") {
    import spark.implicits._
    def ev(shift: Int) = (1 to 400).map { u =>
      val conv = if (refHash32(u.toString) % 2 == 0) u % 10 < 3 else u % 10 < 3 + shift
      (u.toLong, if (conv) "signup" else "view")
    }.toDF("user_id", "event_type")
    val small = Experiment.requiredSampleSize(ev(1), "user_id",
      col("event_type") === "signup").collect().head.getAs[Long]("n_required_per_arm")
    val big = Experiment.requiredSampleSize(ev(4), "user_id",
      col("event_type") === "signup").collect().head.getAs[Long]("n_required_per_arm")
    assert(big < small, s"big-effect n $big should be < small-effect n $small")
  }

  test("difference-in-differences nets out a shared time trend") {
    import spark.implicits._
    // both arms drift +10 post; treated gets +5 extra → DiD = 5
    val rows = (1 to 300).flatMap { u =>
      val treated = refHash32(u.toString) % 2 == 0
      Seq((u.toLong, ts("2024-01-05 00:00:00"), "view", 100.0),
        (u.toLong, ts("2024-01-20 00:00:00"), "view",
          100.0 + 10.0 + (if (treated) 5.0 else 0.0)))
    }
    val r = Experiment.diffInDiff(rows.toDF("user_id", "ts", "event_type", "value"),
      "user_id", "value",
      col("ts") < lit("2024-01-16").cast("timestamp"),
      col("ts") >= lit("2024-01-16").cast("timestamp")).collect().head
    assert(r.getAs[Double]("did") == 5.0)
  }
}
