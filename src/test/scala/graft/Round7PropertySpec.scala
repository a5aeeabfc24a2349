package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{RobustStats, Smoothing}
import graft.operators.{IncrementalAgg, IntervalJoin}

/** Randomized property tests (fixed seeds) for the round-7 operators:
  * adversarial random inputs against sequential reference
  * implementations — boundary-touching intervals, duplicate values for
  * tie-break stress, random split points for merge algebra. */
class Round7PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("interval overlap equals brute force on boundary-heavy random input") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // quantized starts so endpoint-touching pairs are common
    val a = (0 until 120).map { i =>
      val s = rnd.nextInt(50) * 100L
      (i.toLong, s, s + rnd.nextInt(8) * 50L)
    }
    val b = (0 until 120).map { i =>
      val s = rnd.nextInt(50) * 100L
      (i.toLong, s, s + rnd.nextInt(8) * 50L)
    }
    val got = IntervalJoin.overlapJoin(
        a.toDF("a_id", "a_start", "a_end"), b.toDF("b_id", "b_start", "b_end"),
        "a_start", "a_end", "b_start", "b_end", 130L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      (ai, as_, ae) <- a; (bi, bs, be) <- b if as_ <= be && bs <= ae
    } yield (ai, bi)
    assert(got.sorted.toSeq == brute.sorted)
    assert(got.length == got.toSet.size, "exactly-once violated")
  }

  test("incremental merge equals full recompute for any random split") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 800).map { i =>
      (s"k${rnd.nextInt(9)}", math.round(rnd.nextDouble() * 1e8) / 100.0)
    }
    val full = rows.toDF("k", "v")
    (0 until 3).foreach { trial =>
      val mask = rows.map(_ => rnd.nextBoolean())
      val s1 = rows.zip(mask).collect { case (r, true) => r }.toDF("k", "v")
      val s2 = rows.zip(mask).collect { case (r, false) => r }.toDF("k", "v")
      val merged = IncrementalAgg.render(IncrementalAgg.merge(
        IncrementalAgg.partials(s1, "k", "v"),
        IncrementalAgg.partials(s2, "k", "v"))).collect().map(_.toString)
      val direct = IncrementalAgg.render(
        IncrementalAgg.partials(full, "k", "v")).collect().map(_.toString)
      assert(merged.toSeq == direct.toSeq, s"trial $trial")
    }
  }

  test("MAD report matches a sequential reference on tie-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = (0 until 600).map { i =>
      (s"g${i % 3}", i.toLong, rnd.nextInt(12).toDouble) // heavy ties
    }
    val got = RobustStats.madReport(rows.toDF("g", "id", "v"), "g", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    val ref = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, es) =>
      val vq = es.sortBy(e => (math.round(e._3 * 1e6), e._2))
        .map(e => math.round(e._3 * 1e6))
      val med = vq((vq.size + 1) / 2 - 1)
      val devs = es.map(e => math.abs(math.round(e._3 * 1e6) - med))
      val sortedDevs = es.map(e => (math.abs(math.round(e._3 * 1e6) - med), e._2))
        .sortBy(identity).map(_._1)
      val mad = sortedDevs((sortedDevs.size + 1) / 2 - 1)
      (g, es.size.toLong, med / 1e6, mad / 1e6,
        devs.count(_ > 3L * mad).toLong)
    }
    assert(got == ref)
  }

  test("dyadic EWMA matches the reference on random multi-key streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val rows = (0 until 900).map { i =>
      (rnd.nextInt(7).toLong,
        Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        i.toLong, math.round(rnd.nextDouble() * 1e7) / 1e3)
    }
    val got = Smoothing.ewmaDyadic(
        rows.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v")
      .select("id", "ewma").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._2.getTime, e._3))
      val vq = ordered.map(e => math.round(e._4 * 1e6))
      ordered.indices.foreach { t =>
        val lo = math.max(0, t - 10)
        val wsum = (lo to t).map(i => vq(i) * (1L << (10 - (t - i)))).sum
        val wtot = (lo to t).map(i => 1L << (10 - (t - i))).sum
        val exp = math.rint(wsum.toDouble / wtot.toDouble / 1e6 * 1e4) / 1e4
        assert(math.abs(got(ordered(t)._3) - exp) < 1e-9, s"id ${ordered(t)._3}")
      }
    }
  }
}
