package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.RankEffects

/** Cliff's delta / Vargha-Delaney A and Brunner-Munzel vs brute-force
  * computation on the raw sample. */
class RankEffectsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val rnd = new scala.util.Random(11)
  // heavily tied two-arm sample with a planted shift
  private val xs = (0 until 60).map(_ => (rnd.nextInt(8) + 2).toDouble)
  private val ys = (0 until 45).map(_ => (rnd.nextInt(8)).toDouble)

  private def df = {
    import spark.implicits._
    (xs.map(v => (1, v)) ++ ys.map(v => (0, v))).toDF("arm", "v")
  }

  test("cliff's delta matches the brute dominance count") {
    val gt = (for (x <- xs; y <- ys) yield if (x > y) 1 else 0).sum
    val eq = (for (x <- xs; y <- ys) yield if (x == y) 1 else 0).sum
    val n1 = xs.size.toDouble; val n2 = ys.size.toDouble
    val a = (gt + eq / 2.0) / (n1 * n2)
    val delta = (2 * gt + eq - n1 * n2) / (n1 * n2)
    val r = RankEffects.cliffsDelta(df, "v", col("arm") === 1).head
    assert(r.getAs[Long]("n1") == 60L && r.getAs[Long]("n2") == 45L)
    assert(math.abs(r.getAs[Double]("a_vd") - a) < 5e-7)
    assert(math.abs(r.getAs[Double]("cliffs_delta") - delta) < 5e-7)
  }

  test("cliff's delta bands: identical arms are negligible, disjoint arms large") {
    import spark.implicits._
    val same = (1 to 40).map(i => (i % 2, (i % 5).toDouble)).toDF("arm", "v")
    val r0 = RankEffects.cliffsDelta(same, "v", col("arm") === 1).head
    assert(r0.getAs[String]("magnitude") == "negligible")
    val split = ((1 to 20).map(_ => (1, 9.0)) ++ (1 to 20).map(_ => (0, 1.0)))
      .toDF("arm", "v")
    val r1 = RankEffects.cliffsDelta(split, "v", col("arm") === 1).head
    assert(r1.getAs[Double]("cliffs_delta") == 1.0)
    assert(r1.getAs[String]("magnitude") == "large")
  }

  test("brunner-munzel matches the brute midrank formulation") {
    // brute: midranks over the pooled sample and within each arm
    val all = xs ++ ys
    def midranks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
    }
    val rAll = midranks(all); val rX = midranks(xs); val rY = midranks(ys)
    val n1 = xs.size.toDouble; val n2 = ys.size.toDouble; val n = n1 + n2
    val rbar1 = xs.map(rAll).sum / n1
    val rbar2 = ys.map(rAll).sum / n2
    def svar(vs: Seq[Double], rIn: Map[Double, Double], rbar: Double, nk: Double) = {
      val ds = vs.map(v => rAll(v) - rIn(v))
      val m = ds.sum / nk
      ds.map(d => (d - m) * (d - m)).sum / (nk - 1)
    }
    val v1 = svar(xs, rX, rbar1, n1); val v2 = svar(ys, rY, rbar2, n2)
    val wBrute = n1 * n2 * (rbar2 - rbar1) / (n * math.sqrt(n1 * v1 + n2 * v2))
    val dfBrute = math.pow(n1 * v1 + n2 * v2, 2) /
      (math.pow(n1 * v1, 2) / (n1 - 1) + math.pow(n2 * v2, 2) / (n2 - 1))
    val pBrute = (rbar2 - (n2 + 1) / 2) / n1
    val r = RankEffects.brunnerMunzel(df, "v", col("arm") === 1).head
    assert(math.abs(r.getAs[Double]("p_hat") - pBrute) < 5e-7)
    assert(math.abs(r.getAs[Double]("w") - wBrute) < 5e-5)
    assert(math.abs(r.getAs[Double]("df") - dfBrute) < 5e-3)
  }

  test("ansari-bradley matches the brute tie-averaged score computation") {
    // brute: per tie block [l, r] over the pooled order, the doubled
    // score sum has the same triangular closed form; a6 pins the block
    // average exactly as the engine does
    val q1 = xs.map(v => (math.rint(v * 1e6).toLong, 1L))
    val q2 = ys.map(v => (math.rint(v * 1e6).toLong, 0L))
    val byV = (q1 ++ q2).groupBy(_._1).map { case (v, g) =>
      (v, g.count(_._2 == 1L).toLong, g.size.toLong) }.toSeq.sortBy(_._1)
    val nTot = byV.map(_._3).sum
    val k = (nTot + 1) / 2
    var cum = 0L
    var sa1 = BigInt(0); var sa = BigInt(0); var saa = BigInt(0)
    for ((v, c1, ct) <- byV) {
      val l = cum + 1; val r = cum + ct; cum += ct
      val hi = math.min(r, k); val lo = math.max(l, k + 1)
      val t2 = (if (hi >= l) (l + hi) * (hi - l + 1) else 0L) +
        (if (r >= lo) ((nTot + 1) * 2 - lo - r) * (r - lo + 1) else 0L)
      val a6 = math.rint(t2.toDouble * 1e6 / ct).toLong
      sa1 += BigInt(c1) * a6; sa += BigInt(ct) * a6
      saa += BigInt(ct) * a6 * a6
    }
    val n1 = xs.size.toDouble; val n2 = ys.size.toDouble; val nD = nTot.toDouble
    val aStat = sa1.toDouble / 2e6
    val e = n1 * (sa.toDouble / 2e6) / nD
    val varA = n1 * n2 / (nD * (nD - 1)) *
      (saa.toDouble / 4e12 - (sa.toDouble / 2e6) * (sa.toDouble / 2e6) / nD)
    val z = (aStat - e) / math.sqrt(varA)
    val r = RankEffects.ansariBradley(df, "v", col("arm") === 1).head
    assert(r.getAs[Long]("n1") == 60L && r.getAs[Long]("n2") == 45L)
    assert(math.abs(r.getAs[Double]("ab_stat") - aStat) < 0.06)
    assert(math.abs(r.getAs[Double]("z") - z) < 5e-4)
  }

  test("ansari-bradley: the tighter arm collects the larger scores") {
    import spark.implicits._
    // same median 50; arm 1 tight (±1), arm 0 wide (±20)
    val tight = (0 until 40).map(i => (1, 50.0 + (i % 3) - 1))
    val wide = (0 until 40).map(i => (0, 50.0 + (i % 41) - 20))
    val r = RankEffects.ansariBradley((tight ++ wide).toDF("arm", "v"),
      "v", col("arm") === 1).head
    // E[A] under H0 = n1·ā; the tight arm must exceed it → z > 0
    assert(r.getAs[Double]("z") > 2.0)
  }

  test("cucconi matches the brute squared-midrank computation") {
    val all = xs ++ ys
    def midrank(v: Double): Double = {
      val sorted = all.sorted
      val lt = sorted.count(_ < v); val eq = sorted.count(_ == v)
      lt + (eq + 1) / 2.0
    }
    val nTot = all.size.toDouble
    val sR = xs.map(v => { val r = midrank(v); r * r }).sum
    val sC = xs.map(v => { val c = nTot + 1 - midrank(v); c * c }).sum
    val n1 = xs.size.toDouble; val n2 = ys.size.toDouble
    val den = math.sqrt(n1 * n2 * (nTot + 1) * (nTot * 2 + 1) * (nTot * 8 + 11) / 5)
    val u = (6 * sR - n1 * (nTot + 1) * (nTot * 2 + 1)) / den
    val v = (6 * sC - n1 * (nTot + 1) * (nTot * 2 + 1)) / den
    val rho = (nTot * nTot - 4) * 2 / ((nTot * 2 + 1) * (nTot * 8 + 11)) - 1
    val c = (u * u + v * v - u * v * rho * 2) / ((1.0 - rho * rho) * 2)
    val r = RankEffects.cucconi(df, "v", col("arm") === 1).head
    assert(math.abs(r.getAs[Double]("u") - u) < 5e-4)
    assert(math.abs(r.getAs[Double]("v") - v) < 5e-4)
    assert(math.abs(r.getAs[Double]("c_stat") - c) < 5e-3)
  }

  test("lepage reproduces its two component z's and their square sum") {
    import graft.analyze.{RankStats, RankEffects => RE}
    val lep = RE.lepage(df, "v", col("arm") === 1).head
    val mw = RankStats.mannWhitney(df, "v", col("arm") === 1).head
    val ab = RE.ansariBradley(df, "v", col("arm") === 1).head
    assert(math.abs(lep.getAs[Double]("z_w") - mw.getAs[Double]("z")) < 5e-4)
    assert(math.abs(lep.getAs[Double]("z_ab") - ab.getAs[Double]("z")) < 5e-4)
    val zw = lep.getAs[Double]("z_w"); val za = lep.getAs[Double]("z_ab")
    assert(math.abs(lep.getAs[Double]("lepage") - (zw * zw + za * za)) < 5e-3)
  }

  test("cucconi flags a pure scale change that mann-whitney misses") {
    import spark.implicits._
    // same median, very different spread, symmetric — U ≈ −V, C large
    val tight = (0 until 60).map(i => (1, 100.0 + (i % 3) - 1))
    val wide = (0 until 60).map(i => (0, 100.0 + ((i % 21) - 10) * 4))
    val r = RankEffects.cucconi((tight ++ wide).toDF("arm", "v"), "v",
      col("arm") === 1).head
    assert(r.getAs[Double]("c_stat") > 5.0)
  }

  test("brunner-munzel on identical arms: p_hat = 1/2, w = 0") {
    import spark.implicits._
    val same = ((1 to 30).map(i => (1, (i % 6).toDouble)) ++
      (1 to 30).map(i => (0, (i % 6).toDouble))).toDF("arm", "v")
    val r = RankEffects.brunnerMunzel(same, "v", col("arm") === 1).head
    assert(r.getAs[Double]("p_hat") == 0.5)
    assert(r.getAs[Double]("w") == 0.0)
  }
}
