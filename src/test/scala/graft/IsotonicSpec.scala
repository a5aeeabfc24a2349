package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.Isotonic

/** PAV isotonic calibration: monotonicity, mean preservation, and
  * agreement with a brute-force quadratic PAV. */
class IsotonicSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** O(n²) reference PAV: repeatedly merge the first adjacent violator. */
  private def brutePav(ns: Array[Long], pos: Array[Long]): Array[Double] = {
    var blocks = ns.indices.map(i => (ns(i), pos(i), 1)).toList
    var changed = true
    while (changed) {
      changed = false
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Int)]
      for (b <- blocks) {
        out += b
        while (out.size > 1 && {
          val l = out(out.size - 2); val r = out.last
          l._2 * r._1 > r._2 * l._1
        }) {
          val r = out.remove(out.size - 1); val l = out.remove(out.size - 1)
          out += ((l._1 + r._1, l._2 + r._2, l._3 + r._3))
          changed = true
        }
      }
      blocks = out.toList
    }
    blocks.flatMap { case (n, p, s) => List.fill(s)(p.toDouble / n) }.toArray
  }

  test("pav matches brute force on random bin tables") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val k = 1 + rnd.nextInt(30)
      val ns = Array.fill(k)(1L + rnd.nextInt(50))
      val pos = ns.map(n => rnd.nextInt(n.toInt + 1).toLong)
      val fast = {
        val m = classOf[Isotonic.type].getDeclaredMethods
          .find(_.getName == "pav").get
        m.setAccessible(true)
        m.invoke(Isotonic, ns, pos).asInstanceOf[Array[Double]]
      }
      assert(fast.toList == brutePav(ns, pos).toList)
    }
  }

  test("calibrate: iso_rate is monotone and mass-preserving") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map { i =>
      val score = rnd.nextInt(1000) / 1000.0
      // noisy but increasing true rate
      val y = rnd.nextDouble() < (0.2 + 0.6 * score + 0.3 * (rnd.nextDouble() - 0.5))
      (i.toLong, score, y)
    }
    val df = rows.toDF("id", "score", "y")
    val got = Isotonic.calibrate(df, col("score"), col("y"), binScale = 2)
      .orderBy("bin_score").collect()
    val iso = got.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-9 },
      "iso_rate must be non-decreasing in bin_score")
    // weighted mean of iso_rate equals the global positive rate (PAV is
    // mean-preserving); both sides rounded at 6 dp so allow 1e-4 slack
    val n = got.map(_.getAs[Long]("n")).sum
    val posTot = got.map(_.getAs[Long]("pos")).sum
    val isoMass = got.map(r => r.getAs[Double]("iso_rate") * r.getAs[Long]("n")).sum
    assert(math.abs(isoMass - posTot.toDouble) < n * 1e-4)
  }

  test("calibrate on already-monotone bins is the identity") {
    val rows = Seq.tabulate(400)(i => (i.toLong, (i / 100) / 4.0 + 0.1, i % 100 < 10 + (i / 100) * 20))
    val df = rows.toDF("id", "score", "y")
    val got = Isotonic.calibrate(df, col("score"), col("y"), binScale = 3).collect()
    got.foreach { r =>
      assert(r.getAs[Double]("iso_rate") == r.getAs[Double]("rate"))
    }
  }
}
