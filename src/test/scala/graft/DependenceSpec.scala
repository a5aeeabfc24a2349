package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Dependence

/** Hoeffding's D and distance correlation. */
class DependenceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("hoeffding D matches the brute rank formulation and sees a U-shape") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // U-shaped: y = (x-15)² + noise — Pearson/Spearman ≈ 0, D > 0
    val pts = (0 until 30).map { i =>
      val x = i.toDouble
      (x, (x - 15) * (x - 15) + math.rint(rnd.nextGaussian() * 300) / 100)
    }
    val got = Dependence.hoeffdingD(pts.toDF("x", "y"), col("x"), col("y"))
      .head
    // brute (tie-free data): midranks = plain ranks
    val xs = pts.map(p => math.rint(p._1 * 1e6).toLong)
    val ys = pts.map(p => math.rint(p._2 * 1e6).toLong)
    val n = xs.size
    def rank(vs: Seq[Long], v: Long) = vs.count(_ < v) + (vs.count(_ == v) + 1) / 2.0
    val terms = (0 until n).map { i =>
      val r = rank(xs, xs(i)); val s = rank(ys, ys(i))
      val q = (0 until n).count(j => j != i && xs(j) < xs(i) && ys(j) < ys(i))
      (q.toDouble, r, s)
    }
    val d1 = terms.map { case (q, _, _) => q * (q - 1) }.sum
    val d2 = terms.map { case (_, r, s) => (r - 1) * (r - 2) * (s - 1) * (s - 2) }.sum
    val d3 = terms.map { case (q, r, s) => (r - 2) * (s - 2) * q }.sum
    val nd = n.toDouble
    val dBrute = ((nd - 2) * (nd - 3) * d1 + d2 - (nd - 2) * d3 * 2) * 30 /
      (nd * (nd - 1) * (nd - 2) * (nd - 3) * (nd - 4))
    assert(got.getAs[Long]("n") == 30L)
    assert(math.abs(got.getAs[Double]("d_stat") - dBrute) < 5e-7)
    assert(got.getAs[Double]("d_stat") > 0.05, "U-shape must register")
    // independence control: shuffled y ≈ 0
    val shuf = rnd.shuffle(pts.map(_._2))
    val ind = Dependence.hoeffdingD(
      pts.map(_._1).zip(shuf).toDF("x", "y"), col("x"), col("y")).head
    assert(math.abs(ind.getAs[Double]("d_stat")) < 0.05)
  }

  test("distance correlation matches brute and sees the same U-shape") {
    import spark.implicits._
    val pts = (0 until 25).map { i =>
      val x = i.toDouble
      (x, (x - 12) * (x - 12) / 3)
    }
    val got = Dependence.distanceCorr(pts.toDF("x", "y"), col("x"), col("y"))
      .head
    // brute with the same quantization/pinning pipeline
    val xs = pts.map(p => math.rint(p._1 * 1e6).toLong)
    val ys = pts.map(p => math.rint(p._2 * 1e6).toLong)
    val n = xs.size
    def dmat(vs: Seq[Long]) =
      Array.tabulate(n, n)((i, j) => math.abs(vs(i) - vs(j)).toDouble)
    def center(m: Array[Array[Double]]) = {
      val ri = m.map(r => BigInt(r.map(_.toLong).sum).toDouble / n)
      val cj = (0 until n).map(j => BigInt((0 until n).map(i => m(i)(j).toLong).sum).toDouble / n)
      val g = BigInt(m.flatten.map(_.toLong).sum).toDouble / (n.toLong * n)
      Array.tabulate(n, n)((i, j) => m(i)(j) - ri(i) - cj(j) + g)
    }
    val a = center(dmat(xs)); val b = center(dmat(ys))
    def pin(v: Double) = math.rint(v / 1e6)
    val sab = (for (i <- 0 until n; j <- 0 until n) yield pin(a(i)(j) * b(i)(j))).sum
    val saa = (for (i <- 0 until n; j <- 0 until n) yield pin(a(i)(j) * a(i)(j))).sum
    val sbb = (for (i <- 0 until n; j <- 0 until n) yield pin(b(i)(j) * b(i)(j))).sum
    val nsq = (n.toLong * n).toDouble
    val dcor = math.signum(sab / nsq) * math.sqrt(math.abs(sab / nsq)) /
      math.sqrt(math.sqrt((saa / nsq) * (sbb / nsq)))
    assert(got.getAs[Long]("n") == 25L)
    assert(math.abs(got.getAs[Double]("dcor") - dcor) < 5e-6)
    assert(got.getAs[Double]("dcor") > 0.3, "U-shape must register")
  }
}
