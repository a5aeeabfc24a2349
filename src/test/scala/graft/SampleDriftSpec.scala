package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Drift
import graft.operators.TrainOrder

/** Weighted sampling (Efraimidis-Spirakis) and PSI drift monitoring. */
class SampleDriftSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ------------------------------------------------------- weighted sample

  test("weighted sample: deterministic, exactly k, positives only") {
    val df = (1 to 100).map(i => (i.toLong, "g", if (i % 10 == 0) 0.0 else i / 100.0))
      .toDF("id", "g", "w")
    val a = TrainOrder.weightedSamplePerGroup(df, "g", "id", "w", 15)
      .select("id").as[Long].collect().toSet
    val b = TrainOrder.weightedSamplePerGroup(df.repartition(13), "g", "id", "w", 15)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 15)
    assert(a.forall(_ % 10 != 0), "zero-weight rows must never win")
  }

  test("weighted sample favors heavy weights in aggregate") {
    // two strata: weight 10 vs weight 0.1 — across many groups the heavy
    // stratum must dominate the selections (odd group modulus so both
    // parities compete inside every group)
    val df = (1 to 2000).map { i =>
      (i.toLong, s"g${i % 39}", if (i % 2 == 0) 10.0 else 0.1)
    }.toDF("id", "g", "w")
    val picked = TrainOrder.weightedSamplePerGroup(df, "g", "id", "w", 5)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ % 2 == 0)
    assert(heavy > picked.length * 0.8,
      s"heavy stratum won only $heavy of ${picked.length}")
  }

  // ----------------------------------------------------------- Wasserstein

  test("wasserstein1: identical snapshots 0; pure shift = the shift") {
    val a = (1 to 500).map(i => (i.toLong, (i % 50).toDouble)).toDF("id", "value")
    assert(Drift.wasserstein1(a, a, "value").head.getAs[Double]("w1") == 0.0)
    val b = (1 to 500).map(i => (i.toLong, (i % 50) + 7.25)).toDF("id", "value")
    // W1 between X and X + c is exactly |c|
    assert(Drift.wasserstein1(a, b, "value").head.getAs[Double]("w1") == 7.25)
  }

  test("wasserstein1 matches a brute sorted-sample computation") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(300)(math.rint(rnd.nextDouble() * 1e4) / 1e2)
    val ys = Seq.fill(300)(math.rint(rnd.nextDouble() * 1e4) / 1e2 + 5)
    val a = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "value")
    val b = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }.toDF("id", "value")
    val got = Drift.wasserstein1(a, b, "value").head.getAs[Double]("w1")
    // equal sample sizes: W1 = mean |x_(i) − y_(i)| over sorted samples
    val brute = xs.sorted.zip(ys.sorted).map { case (x, y) => math.abs(x - y) }
      .sum / 300
    assert(math.abs(got - brute) < 1e-6, s"$got vs $brute")
  }

  // ------------------------------------------------------------------ PSI

  test("psi of identical snapshots is zero in every bucket") {
    val v = (1 to 1000).map(i => i.toLong -> (i % 97).toDouble)
    val df = v.toDF("id", "value")
    val got = Drift.psi(df, df, "value", nBuckets = 10).collect()
    assert(got.forall(_.getAs[Double]("psi_term") == 0.0))
    assert(got.map(_.getAs[Long]("n_base")).sum == 1000)
  }

  // ------------------------------------------------------------------ JSD

  test("jsd of identical categorical snapshots is zero") {
    val df = (1 to 300).map(i => (i.toLong, s"c${i % 7}")).toDF("id", "cat")
    val got = Drift.jensenShannon(df, df, "cat").collect()
    assert(got.length == 7)
    assert(got.forall(_.getAs[Double]("jsd_nats") == 0.0))
    assert(got.forall(_.getAs[Double]("jsd_term") == 0.0))
  }

  test("jsd of disjoint supports is ln 2, each term p/2 * ln 2") {
    val a = (1 to 100).map(i => (i.toLong, "only_a")).toDF("id", "cat")
    val b = (1 to 50).map(i => (i.toLong, "only_b")).toDF("id", "cat")
    val got = Drift.jensenShannon(a, b, "cat").collect()
    val total = got.head.getAs[Double]("jsd_nats")
    assert(math.abs(total - math.log(2.0)) < 1e-6,
      s"disjoint supports must give ln 2, got $total")
    // symmetric: both categories carry half the divergence
    assert(got.forall(r =>
      math.abs(r.getAs[Double]("jsd_term") - math.log(2.0) / 2) < 1e-6))
  }

  test("jsd is symmetric and bounded by ln 2") {
    val a = (1 to 400).map(i => (i.toLong, s"c${i % 5}")).toDF("id", "cat")
    val b = (1 to 400).map(i => (i.toLong, s"c${i % 3}")).toDF("id", "cat")
    val ab = Drift.jensenShannon(a, b, "cat").head.getAs[Double]("jsd_nats")
    val ba = Drift.jensenShannon(b, a, "cat").head.getAs[Double]("jsd_nats")
    assert(ab == ba, s"JSD must be symmetric: $ab vs $ba")
    assert(ab > 0 && ab <= math.log(2.0) + 1e-12)
  }

  test("psi detects a shifted distribution") {
    val base = (1 to 1000).map(i => i.toLong -> (i % 100).toDouble).toDF("id", "value")
    val shifted = (1 to 1000).map(i => i.toLong -> ((i % 100) + 60.0)).toDF("id", "value")
    val total = Drift.psi(base, shifted, "value", nBuckets = 10)
      .agg(sum("psi_term")).head.getDouble(0)
    assert(total > 0.25, s"shifted distribution must read as drift, psi=$total")
  }
}
