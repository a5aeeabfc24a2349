package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Agreement

/** Krippendorff's alpha, Kendall's W, Bland-Altman. */
class AgreementExtraSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("krippendorff: perfect within-unit agreement gives alpha = 1") {
    import spark.implicits._
    // every unit rates one category consistently; categories differ
    // across units so D_e > 0
    val rows = (0 until 30).flatMap(u =>
      Seq.fill(3)((u.toLong, if (u % 3 == 0) "a" else if (u % 3 == 1) "b" else "c")))
    val r = Agreement.krippendorffAlpha(rows.toDF("u", "c"),
      col("u"), col("c")).head
    assert(r.getAs[Long]("n_units") == 30L)
    assert(r.getAs[Long]("n_ratings") == 90L)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("krippendorff matches the brute coincidence computation with missing data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val cats = Vector("a", "b", "c", "d")
    // variable rater counts 1..5 — singletons must drop
    val rows = (0 until 50).flatMap { u =>
      val k = 1 + rnd.nextInt(5)
      (0 until k).map(_ => (u.toLong, cats(rnd.nextInt(4))))
    }
    val kept = rows.groupBy(_._1).filter(_._2.size >= 2)
    val nTot = kept.values.map(_.size).sum
    val dObs = kept.values.map { g =>
      val nu = g.size
      val sq = g.groupBy(_._2).values.map(x => x.size.toLong * x.size).sum
      math.rint((nu.toLong * nu - sq).toDouble * 1e9 / (nu - 1)) / 1e9
    }.sum
    val margSq = kept.values.flatten.groupBy(_._2).values
      .map(x => x.size.toLong * x.size).sum
    val alpha = 1.0 - dObs * (nTot - 1) / (nTot.toDouble * nTot - margSq)
    val r = Agreement.krippendorffAlpha(rows.toDF("u", "c"),
      col("u"), col("c")).head
    assert(r.getAs[Long]("n_units") == kept.size.toLong)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 5e-7)
  }

  test("kendall's W: identical block rankings give W = 1, reversals give small W") {
    import spark.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    // 6 blocks all ranking x < y < z
    val agree = (1 to 6).flatMap(d => Seq(
      (day(d), "x", 1.0 * d), (day(d), "y", 2.0 * d), (day(d), "z", 3.0 * d)))
    val r1 = Agreement.kendallW(agree.toDF("ts", "t", "v"),
      to_date(col("ts")), col("t"), col("v")).head
    assert(r1.getAs[Double]("w") == 1.0)
    assert(r1.getAs[Long]("df") == 2L)
    // half the blocks reverse the order → near-zero concordance
    val fight = (1 to 6).flatMap(d => if (d % 2 == 0) Seq(
      (day(d), "x", 1.0), (day(d), "y", 2.0), (day(d), "z", 3.0))
    else Seq((day(d), "x", 3.0), (day(d), "y", 2.0), (day(d), "z", 1.0)))
    val r2 = Agreement.kendallW(fight.toDF("ts", "t", "v"),
      to_date(col("ts")), col("t"), col("v")).head
    assert(r2.getAs[Double]("w") == 0.0)
  }

  test("kendall's W tie correction: an all-tied block contributes no spread") {
    import spark.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    val rows = (1 to 4).flatMap(d => Seq(
      (day(d), "x", 1.0), (day(d), "y", 2.0), (day(d), "z", 3.0))) ++
      Seq((day(9), "x", 5.0), (day(9), "y", 5.0), (day(9), "z", 5.0))
    val r = Agreement.kendallW(rows.toDF("ts", "t", "v"),
      to_date(col("ts")), col("t"), col("v")).head
    assert(r.getAs[Long]("n_blocks") == 5L)
    // brute: R2 sums with the tied block contributing (k+1)=4 each
    // doubled: tied block r2 = 2*0+3+1 = 4 per treatment
    // agreeing blocks: x:2*0+1+1=... per block r2(x)=3? positions: one
    // below none → r2 = 2*0+1+1 = wait teq=1: r2 = 2*cLt + 1 + 1
    // x: cLt=0 → 2; y: cLt=1 → 4... doubled ranks are 2r: x=2,y=4,z=6 ✓
    val r2x = 4 * 2 + 4; val r2y = 4 * 4 + 4; val r2z = 4 * 6 + 4
    val n = 5L; val k = 3L
    val mean = n * (k + 1) // doubled mean = 20
    val s4 = Seq(r2x, r2y, r2z).map(v => (v - mean) * (v - mean)).sum
    val tsum = 4 * 3 * (1 * 1 - 1) + (3 * 3 - 1) * 3 // tied block: 3 members of t=3
    val den = n.toDouble * n * k * (k * k - 1) - n.toDouble * tsum
    val w = s4.toDouble * 3 / den
    assert(math.abs(r.getAs[Double]("w") - w) < 5e-7)
  }

  test("bland-altman matches the brute limits computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val units = (0 until 80).map { u =>
      val base = 50 + rnd.nextGaussian() * 10
      (u.toLong, math.rint(base * 100) / 100,
        math.rint((base + 1.5 + rnd.nextGaussian()) * 100) / 100)
    }
    val a = units.map(x => (x._1, x._2)).toDF("u", "m")
    val b = units.map(x => (x._1, x._3)).toDF("u", "m")
    val ds = units.map(x =>
      (math.rint(x._2 * 1e6).toLong - math.rint(x._3 * 1e6).toLong))
    val n = ds.size.toDouble
    val mean = ds.sum.toDouble / n / 1e6
    val sd = math.sqrt((ds.map(d => d.toDouble * d).sum -
      ds.sum.toDouble * ds.sum / n) / (n - 1)) / 1e6
    val within = ds.count(d =>
      d / 1e6 >= mean - sd * 1.96 && d / 1e6 <= mean + sd * 1.96) / n
    val r = Agreement.blandAltman(a, b, "u", "m").head
    assert(r.getAs[Long]("n") == 80L)
    assert(math.abs(r.getAs[Double]("mean_diff") - mean) < 5e-7)
    assert(math.abs(r.getAs[Double]("sd_diff") - sd) < 5e-7)
    assert(math.abs(r.getAs[Double]("loa_lower") - (mean - sd * 1.96)) < 5e-7)
    assert(math.abs(r.getAs[Double]("pct_within") - within) < 5e-7)
  }
}
