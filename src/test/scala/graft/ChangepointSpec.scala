package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Changepoint
import graft.analyze.Trend

/** Single-breakpoint changepoint detection. */
class ChangepointSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("cusum matches the brute recursive monitor on a noisy series") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val xs = (0 until 40).map(d =>
      10.0 + rnd.nextGaussian() + (if (d >= 30) 3.0 else 0.0))
    val rows = xs.zipWithIndex.map { case (x, d) =>
      ("g", Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 12, 0).plusDays(d)), x)
    }
    val got = Changepoint.cusum(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .head
    // brute: identical quantization path
    val qs = xs.map(x => math.rint(x * 1e6).toLong)
    val n = qs.length
    val mu = qs.map(_.toDouble).sum / n
    val sigma = math.sqrt(math.max(
      qs.map(q => q.toDouble * q).sum / n - mu * mu, 0.0))
    val ys = qs.map(q => math.rint(q - mu - 0.5 * sigma).toLong)
    var s = 0L; var smax = 0L; var alarm = -1
    val hq = math.rint(4.0 * sigma).toLong
    for ((y, d) <- ys.zipWithIndex) {
      s = math.max(0L, s + y); smax = math.max(smax, s)
      if (alarm < 0 && hq > 0 && s >= hq) alarm = d
    }
    assert(got.getAs[Long]("n_days") == 40L)
    assert(got.getAs[Double]("s_max") ==
      math.rint(smax.toDouble / sigma * 1e4) / 1e4)
    assert(alarm >= 30, "alarm must fire after the planted shift")
    assert(got.getAs[Timestamp]("alarm_day").toLocalDateTime.toLocalDate ==
      java.time.LocalDate.of(2024, 1, 1).plusDays(alarm))
  }

  test("cusum: stable series never alarms") {
    import spark.implicits._
    val rows = (0 until 30).map(d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d % 2 == 0) 10.0 else 12.0))
    val got = Changepoint.cusum(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .head
    assert(got.isNullAt(got.fieldIndex("alarm_day")))
    assert(got.getAs[Double]("s_max") < 4.0)
  }

  test("a clean level shift is found at the exact day") {
    import spark.implicits._
    // 10 days at 10.0, then 10 days at 50.0 → break at day 11
    val rows = (0 until 20).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d < 10) 10.0 else 50.0)
    }
    val r = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getTimestamp(1).toString.startsWith("2024-01-11"))
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 50.0)
    assert(r.getDouble(4) == 0.0) // piecewise-constant fit is exact
  }

  test("noisy shift still localizes; SSE beats every other split") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        (if (d < 12) 20.0 else 80.0) + rnd.nextInt(5))
    }
    val r = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getTimestamp(1).toString.startsWith("2024-01-13"))
    assert(r.getDouble(2) < 30 && r.getDouble(3) > 70)
  }

  test("binary segmentation finds both breaks of a three-level series") {
    import spark.implicits._
    // 10 days @ 5, 10 days @ 50, 10 days @ 200 → breaks at day 11 and 21
    val rows = (0 until 30).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d < 10) 5.0 else if (d < 20) 50.0 else 200.0)
    }
    val got = Changepoint.binarySegmentation(
        rows.toDF("g", "ts", "v"), "g", "ts", "v", maxBreaks = 4)
      .collect().map(_.getTimestamp(1).toString.take(10)).toSeq
    assert(got == Seq("2024-01-11", "2024-01-21"))
  }

  test("binary segmentation: flat series yields no breaks; budget caps") {
    import spark.implicits._
    val flat = (0 until 20).map(d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"), 7.0))
    assert(Changepoint.binarySegmentation(
      flat.toDF("g", "ts", "v"), "g", "ts", "v", 4).count() == 0)
    // alternating noise: gains are real but budget must cap the count
    val alt = (0 until 24).map(d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d % 2 == 0) 0.0 else 100.0))
    assert(Changepoint.binarySegmentation(
      alt.toDF("g", "ts", "v"), "g", "ts", "v", 3).count() <= 3)
  }

  test("chi-square: independent table ≈ 0; dependent table is large") {
    import spark.implicits._
    import graft.analyze.Contingency
    // perfectly independent: every (a,b) cell equal
    val ind = (for { a <- 'a' to 'c'; b <- 1 to 4; _ <- 1 to 25 }
      yield (a.toString, b)).toDF("x", "y")
    val r1 = Contingency.chiSquare(ind, col("x"), col("y")).collect().head
    assert(r1.getDouble(3) == 0.0 && r1.getDouble(5) == 0.0)
    assert(r1.getLong(4) == 6) // (3-1)(4-1)
    // perfectly dependent: b determined by a
    val dep = (for { a <- 1 to 3; _ <- 1 to 30 } yield (s"k$a", a)).toDF("x", "y")
    val r2 = Contingency.chiSquare(dep, col("x"), col("y")).collect().head
    // χ² = N·(min(R,C)−1) at full association → V = 1
    assert(math.abs(r2.getDouble(3) - 180.0) < 1e-6)
    assert(r2.getDouble(5) == 1.0)
  }

  test("single-day keys are dropped, multi-key frames stay independent") {
    import spark.implicits._
    val rows = Seq(
      ("solo", ts("2024-01-01 00:00:00"), 1.0),
      ("pair", ts("2024-01-01 00:00:00"), 1.0),
      ("pair", ts("2024-01-02 00:00:00"), 9.0))
    val got = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect()
    assert(got.map(_.getString(0)).toSeq == Seq("pair"))
    assert(got.head.getDouble(2) == 1.0 && got.head.getDouble(3) == 9.0)
  }

  test("partial correlation removes a pure common driver") {
    import spark.implicits._
    import graft.analyze.Contingency
    // x = z + noise_x, y = z + noise_y with independent noises:
    // r_xy is large through z; r_xy.z collapses toward 0
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { _ =>
      val z = rnd.nextInt(100).toDouble
      (z + rnd.nextInt(10), z + rnd.nextInt(10), z)
    }
    val r = Contingency.partialCorr(rows.toDF("x", "y", "z"),
      org.apache.spark.sql.functions.col("x"),
      org.apache.spark.sql.functions.col("y"),
      org.apache.spark.sql.functions.col("z")).collect().head
    assert(r.getDouble(1) > 0.9)             // raw r_xy inflated by z
    assert(math.abs(r.getDouble(4)) < 0.2)   // partialled out
  }

  test("Theil-Sen slope resists the outlier that drags OLS") {
    import spark.implicits._
    // y = 2/day, one wild day at +10000
    val rows = (0 until 20).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"),
        2.0 * d + (if (d == 10) 10000.0 else 0.0))
    }
    val df = rows.toDF("g", "ts", "v")
    val ts_ = Trend.theilSenMannKendall(df, "g", "ts", "v").collect().head
    assert(math.abs(ts_.getDouble(2) - 2.0) < 0.5, s"TS slope ${ts_.getDouble(2)}")
    val ols = Trend.trendLines(df, "g", "ts", "v").collect().head
    assert(math.abs(ols.getDouble(2) - 2.0) > 5.0, s"OLS should be dragged: ${ols.getDouble(2)}")
  }

  test("Mann-Kendall S on a strictly increasing series is n(n-1)/2") {
    import spark.implicits._
    val rows = (0 until 12).map(d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"), d.toDouble))
    val r = Trend.theilSenMannKendall(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getLong(3) == 66L) // 12*11/2
    assert(r.getDouble(2) == 1.0)
  }

  test("single break at the LAST candidate reports the final day, not null") {
    import spark.implicits._
    // flat series with one outlier on the last day: the best split is
    // after t = n-1, whose lead(day) only exists when computed BEFORE
    // the candidate filter (regression: sf0.1 'purchase' reported NaT)
    val rows = (0 until 10).map { d =>
      ("g", ts(f"2024-01-${d + 1}%02d 12:00:00"), if (d == 9) 500.0 else 10.0)
    }
    val r = Changepoint.singleBreak(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getTimestamp(1) != null)
    assert(r.getTimestamp(1).toString.startsWith("2024-01-10"))
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 500.0)
  }
}
