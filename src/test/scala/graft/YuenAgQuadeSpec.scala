package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{RankStats, RobustStats, VarianceTests}

/** Yuen trimmed-means test, Alexander-Govern, Quade — vs brute-force
  * formulations on raw samples. */
class YuenAgQuadeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("yuen matches the brute trim/winsorize computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val xs = (0 until 47).map(_ => math.rint(rnd.nextGaussian() * 400 + 5000) / 100)
    val ys = (0 until 39).map(_ => math.rint(rnd.nextGaussian() * 900 + 5200) / 100)
    val df = (xs.map(v => (1, v)) ++ ys.map(v => (0, v))).toDF("arm", "v")
    def brute(vs: Seq[Double]) = {
      val q = vs.map(v => math.rint(v * 1e6).toLong).sorted
      val n = q.size; val g = n / 5; val h = n - 2 * g
      val kept = q.slice(g, n - g)
      val tm = kept.sum.toDouble / h / 1e6
      val win = q.take(g).map(_ => q(g)) ++ kept ++ q.takeRight(g).map(_ => q(n - g - 1))
      val ws = win.map(_.toDouble).sum
      val wss = win.map(v => v.toDouble * v).sum
      val d = (wss - ws * ws / n) / (h.toDouble * (h - 1)) / 1e12
      (n, h, tm, d)
    }
    val (n1, h1, tm1, d1) = brute(xs); val (n2, h2, tm2, d2) = brute(ys)
    val t = (tm1 - tm2) / math.sqrt(d1 + d2)
    val dfree = (d1 + d2) * (d1 + d2) /
      (d1 * d1 / (h1 - 1) + d2 * d2 / (h2 - 1))
    val r = RobustStats.yuenTest(df, "v", col("arm") === 1).head
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("h1") == h1 && r.getAs[Long]("h2") == h2)
    assert(math.abs(r.getAs[Double]("tm1") - tm1) < 5e-7)
    assert(math.abs(r.getAs[Double]("tm2") - tm2) < 5e-7)
    assert(math.abs(r.getAs[Double]("t") - t) < 5e-5)
    assert(math.abs(r.getAs[Double]("df") - dfree) < 5e-3)
  }

  test("yuen: heavy outliers in one arm barely move the trimmed t") {
    import spark.implicits._
    val base = (0 until 50).map(i => (1, 50.0 + (i % 7))) ++
      (0 until 50).map(i => (0, 50.0 + (i % 7)))
    val clean = RobustStats.yuenTest(base.toDF("arm", "v"), "v",
      col("arm") === 1).head
    // same data plus five absurd outliers in arm 1 — all inside the trim
    val dirty = base ++ (0 until 5).map(_ => (1, 1e6))
    val r = RobustStats.yuenTest(dirty.toDF("arm", "v"), "v",
      col("arm") === 1).head
    assert(math.abs(clean.getAs[Double]("t")) < 1e-9)
    assert(math.abs(r.getAs[Double]("tm1") - clean.getAs[Double]("tm1")) < 0.5)
  }

  test("alexander-govern matches the brute Hill-transform computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val groups = Map(
      "a" -> (0 until 40).map(_ => math.rint(rnd.nextGaussian() * 300 + 5000) / 100),
      "b" -> (0 until 25).map(_ => math.rint(rnd.nextGaussian() * 800 + 5300) / 100),
      "c" -> (0 until 55).map(_ => math.rint(rnd.nextGaussian() * 150 + 4900) / 100))
    val df = groups.toSeq.flatMap { case (k, vs) => vs.map(v => (k, v)) }
      .toDF("cls", "v")
    // brute, mirroring the quantization/pin pipeline
    val per = groups.values.toSeq.map { vs =>
      val q = vs.map(v => math.rint(v * 100).toLong)
      val n = q.size
      val m = q.sum.toDouble / n
      val va = (q.map(x => x.toDouble * x).sum - q.sum.toDouble * q.sum / n) / (n - 1)
      val se2 = va / n
      (n, m, se2, math.rint(1.0 / se2 * 1e12).toLong)
    }
    val sw12 = per.map(_._4).sum
    val swm6 = per.map(p => math.rint(p._4 / 1e12 * p._2 * 1e6).toLong).sum
    val mw = (swm6 / 1e6) / (sw12 / 1e12)
    val aStat = per.map { case (n, m, se2, _) =>
      val t = (m - mw) / math.sqrt(se2)
      val nu = (n - 1).toDouble
      val a = nu - 0.5; val b = a * a * 48
      val c = math.signum(t) * math.sqrt(a * math.log(1.0 + t * t / nu))
      val z = c + (c * c * c + c * 3) / b -
        (c * c * c * c * c * c * c * 4 + c * c * c * c * c * 33 +
          c * c * c * 240 + c * 855) /
        (b * b * 10 + b * (c * c * c * c) * 8 + b * 1000)
      val z9 = math.rint(z * 1e9) / 1e9
      math.rint(z9 * z9 * 1e9).toLong
    }.sum / 1e9
    val r = VarianceTests.alexanderGovern(df, col("cls"), col("v")).head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("df") == 2L)
    assert(math.abs(r.getAs[Double]("a_stat") - aStat) < 5e-6)
  }

  test("quade matches the textbook computation on a small complete block design") {
    import spark.implicits._
    // 7 blocks (days) × 3 treatments, planted ordering with noise
    val rnd = new scala.util.Random(9)
    val rows = for (b <- 0 until 7; (t, shift) <- Seq(("x", 0.0), ("y", 2.0), ("z", 5.0)))
      yield (Timestamp.valueOf(f"2024-01-${b + 1}%02d 10:00:00"), t,
        math.rint((10 + shift + rnd.nextGaussian()) * 100) / 100 * (b + 1))
    val df = rows.toDF("ts", "t", "v")
    // brute from the definition
    val cells = rows.groupBy(r => (r._1, r._2))
      .map { case ((b, t), g) =>
        (b, t, g.map(r => math.rint(r._3 * 1e6).toLong).sum) }.toSeq
    val blocks = cells.groupBy(_._1)
    def midrank[T](vs: Seq[Long], v: Long): Double =
      vs.count(_ < v) + (vs.count(_ == v) + 1) / 2.0
    val ranges = blocks.map { case (b, cs) =>
      b -> (cs.map(_._3).max - cs.map(_._3).min) }
    val qRanks = ranges.map { case (b, d) =>
      b -> midrank(ranges.values.toSeq, d) }
    val k = 3
    val sIj = cells.map { case (b, t, x) =>
      (t, qRanks(b) * (midrank(blocks(b).map(_._3), x) - (k + 1) / 2.0)) }
    val a = sIj.map(s => s._2 * s._2).sum
    val bSum = sIj.groupBy(_._1).values.map(g => {
      val s = g.map(_._2).sum; s * s
    }).sum / blocks.size
    val f = (blocks.size - 1) * bSum / (a - bSum)
    val r = RankStats.quade(df, to_date(col("ts")), col("t"), col("v")).head
    assert(r.getAs[Long]("n_blocks") == 7L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("df1") == 2L && r.getAs[Long]("df2") == 12L)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 5e-6)
  }

  test("quade drops incomplete blocks") {
    import spark.implicits._
    val rows = (for (b <- 1 to 5; t <- Seq("x", "y", "z"))
      yield (Timestamp.valueOf(f"2024-02-$b%02d 10:00:00"), t, (b * 3 + t.hashCode % 7).toDouble)) ++
      // an extra day with only one treatment — must be excluded
      Seq((Timestamp.valueOf("2024-02-09 10:00:00"), "x", 99.0))
    val r = RankStats.quade(rows.toDF("ts", "t", "v"), to_date(col("ts")),
      col("t"), col("v")).head
    assert(r.getAs[Long]("n_blocks") == 5L)
  }
}
