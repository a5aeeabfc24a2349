package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Randomized property tests (fixed seeds): the temporal operators
  * against straightforward single-threaded reference implementations on
  * adversarial random inputs — dense timestamp collisions, sub-second
  * gaps exactly at the boundary, keys with a single event. */
class TemporalPropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("sessionize equals the sequential gap walk on random event streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val gapSec = 30L
    // micros; cluster events so some gaps straddle the boundary exactly
    val rows = (1 to 3000).map { i =>
      val user = rnd.nextInt(20).toLong
      val base = rnd.nextInt(2000).toLong * 15_000_000L
      val jitter = rnd.nextInt(3) match {
        case 0 => 0L
        case 1 => gapSec * 1_000_000L            // exactly the gap
        case _ => rnd.nextInt(60_000_000).toLong // arbitrary sub-minute
      }
      (i.toLong, user, base + jitter)
    }
    val df = rows.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val got = Temporal.sessionize(df, "user_id", "ts", gapSec)
      .select($"event_id", $"session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: per user, sort by (ts, insertion) and walk
    rows.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._1))
      var sid = -1L
      var prev = Long.MinValue
      ordered.foreach { case (id, _, us) =>
        if (prev == Long.MinValue || us - prev > gapSec * 1_000_000L) sid += 1
        // ties in ts must land in the same session regardless of order
        assert(got(id) == sid, s"event $id expected session $sid got ${got(id)}")
        prev = us
      }
    }
  }

  test("asOfJoinTolerance nulls matches staler than the bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val tolSec = 60L
    val left = (1 to 500).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(4000).toLong * 1_000_000L, i.toLong) }
    val right = (1 to 200).map { j =>
      (rnd.nextInt(8).toLong, rnd.nextInt(4000).toLong * 1_000_000L, (1000 + j).toLong) }
    val l = left.toDF("k", "us", "lv").withColumn("t", timestamp_micros($"us")).drop("us")
    val r = right.toDF("k", "us", "rv").withColumn("t", timestamp_micros($"us")).drop("us")
    val got = Temporal.asOfJoinTolerance(l, r, "k", "t", "lv", "rv", tolSec)
      .select($"lv", $"asof_rv").collect()
      .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    left.foreach { case (k, t, lv) =>
      val expect = right.filter(e => e._1 == k && e._2 <= t) match {
        case Seq() => None
        case ms =>
          val (_, mt, mv) = ms.maxBy(e => (e._2, e._3))
          if (t - mt <= tolSec * 1_000_000L) Some(mv) else None
      }
      assert(got(lv) == expect, s"left $lv: expected $expect got ${got(lv)}")
    }
  }

  test("asOfJoin equals the brute-force latest-prior match on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(193)
    val left = (1 to 800).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(100_000).toLong, i.toLong) }
    val right = (1 to 300).map { j =>
      (rnd.nextInt(12).toLong, rnd.nextInt(100_000).toLong, (1000 + j).toLong) }
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("k", "t", "rv")
    val got = Temporal.asOfJoin(l, r, "k", "t", "lv", "rv")
      .select($"lv", $"asof_rv").collect()
      .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    left.foreach { case (k, t, lv) =>
      val expect = right.filter(e => e._1 == k && e._2 <= t) match {
        case Seq() => None
        // latest prior; at equal timestamps the operator picks the
        // largest rv among the tied rows (deterministic third sort key)
        case ms => Some(ms.maxBy(e => (e._2, e._3))._3)
      }
      assert(got(lv) == expect, s"left $lv: expected $expect got ${got(lv)}")
    }
  }

  test("rollingZscoreAnomalies equals the brute trailing-window walk") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // sub-hour jitter, occasional big spikes, duplicate timestamps
    val rows = (0 until 400).map { i =>
      val key = i % 5L
      val t = base + (i / 5) * 600000L + (if (i % 7 == 0) 0L else rnd.nextInt(1000) * 250L)
      val v = if (i % 37 == 0) 500.0 + rnd.nextInt(100) else rnd.nextDouble() * 10
      (key, new java.sql.Timestamp(t), v)
    }
    val got = Temporal.rollingZscoreAnomalies(
        rows.toDF("k", "ts", "value"), "k", "ts", "value", 3600L, 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    // brute reference: per key, frame = strictly-earlier micros within 1h
    val brute = scala.collection.mutable.Map[(Long, Long, Double), Double]()
    rows.groupBy(_._1).foreach { case (k, es) =>
      val evs = es.map(e => (e._2.getTime * 1000L, e._3))
      evs.foreach { case (t, v) =>
        val frame = evs.filter { case (t2, _) => t2 >= t - 3600000000L && t2 < t }
        val n = frame.size
        if (n >= 2) {
          // replay the DECIMAL(30,6) quantization of the power sums
          def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          val s1 = frame.map(e => q6(e._2)).sum.toDouble
          val s2 = frame.map(e => q6(e._2 * e._2)).sum.toDouble
          val vr = (s2 - s1 * s1 / n) / (n - 1)
          if (vr > 0) {
            val z = (v - s1 / n) / math.sqrt(vr)
            if (math.abs(z) >= 3.0)
              brute((k, t, v)) = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        }
      }
    }
    assert(got.keySet === brute.keySet,
      s"flag sets differ: only-spark=${got.keySet -- brute.keySet} only-brute=${brute.keySet -- got.keySet}")
    got.foreach { case (key, z) =>
      assert(math.abs(z - brute(key)) < 1e-9, s"$key: $z vs ${brute(key)}")
    }
  }

  test("rollingZscoreAnomalies: undefined baselines never flag, a real spike does") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),   // n=0: no baseline
      (1L, ts("2024-01-01 10:10:00"), 5.5),   // n=1: variance undefined
      (1L, ts("2024-01-01 10:20:00"), 4.5),   // n=2, var>0, |z| small
      (1L, ts("2024-01-01 10:30:00"), 500.0), // spike vs varied history: flags
      (2L, ts("2024-01-01 10:00:00"), 7.0),   // n=0
      (2L, ts("2024-01-01 10:10:00"), 7.0),   // n=1
      (2L, ts("2024-01-01 10:20:00"), 900.0)  // n=2 but ZERO variance: no z
    ).toDF("k", "ts", "value")
    val got = Temporal.rollingZscoreAnomalies(rows, "k", "ts", "value", 3600L, 3.0)
      .collect().map(_.getDouble(2)).toSeq
    assert(got === Seq(500.0)) // the spike; never the zero-variance key
  }
}
