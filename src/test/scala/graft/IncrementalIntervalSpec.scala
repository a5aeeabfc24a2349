package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, IntervalJoin, Sketches}
import graft.sim.Matryoshka

/** Round-7 batch-5 additions: interval overlap join, incremental
  * aggregate maintenance, Matryoshka truncation, count-min estimates. */
class IncrementalIntervalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // ------------------------------------------------------- interval join

  test("overlapJoin equals the brute-force theta join, each pair once") {
    import spark.implicits._
    // deterministic pseudo-random intervals spanning multiple buckets
    val a = (0 until 60).map { i =>
      val s = (i * 733) % 5000L; (i.toLong, s, s + (i * 97) % 700L)
    }.toDF("a_id", "a_start", "a_end")
    val b = (0 until 60).map { i =>
      val s = (i * 911) % 5000L; (i.toLong, s, s + (i * 53) % 400L)
    }.toDF("b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, b, "a_start", "a_end",
        "b_start", "b_end", 256L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = for {
      (ai, as_, ae) <- a.as[(Long, Long, Long)].collect().toSeq
      (bi, bs, be) <- b.as[(Long, Long, Long)].collect().toSeq
      if as_ <= be && bs <= ae
    } yield (ai, bi)
    // exactly once: sequence equality after sort, not set equality
    assert(got.sorted == brute.sorted)
    assert(got.size == got.toSet.size)
  }

  test("overlapJoin handles touching endpoints and disjoint intervals") {
    import spark.implicits._
    val a = Seq((1L, 0L, 10L), (2L, 100L, 110L)).toDF("a_id", "a_start", "a_end")
    val b = Seq((1L, 10L, 20L), (2L, 111L, 120L)).toDF("b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(a, b, "a_start", "a_end",
        "b_start", "b_end", 7L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L))) // endpoint touch joins; disjoint does not
  }

  // ---------------------------------------------------- incremental agg

  test("merge of partials equals partials of the union, exactly") {
    import spark.implicits._
    val full = (0 until 500).map(i =>
      (s"k${i % 7}", (i * 13 % 101) + 0.37)).toDF("k", "v")
    val s1 = full.filter(expr("pmod(crc32(cast(v as string)), 2) = 0"))
    val s2 = full.except(s1)
    val merged = IncrementalAgg.render(IncrementalAgg.merge(
      IncrementalAgg.partials(s1, "k", "v"),
      IncrementalAgg.partials(s2, "k", "v")))
    val direct = IncrementalAgg.render(IncrementalAgg.partials(full, "k", "v"))
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("merge with keys present on only one side keeps them intact") {
    import spark.implicits._
    val s1 = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val s2 = Seq(("b", 5.0)).toDF("k", "v")
    val got = IncrementalAgg.render(IncrementalAgg.merge(
        IncrementalAgg.partials(s1, "k", "v"),
        IncrementalAgg.partials(s2, "k", "v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(("a", 2L, 3.0, 1.0, 2.0), ("b", 1L, 5.0, 5.0, 5.0)))
  }

  // ------------------------------------------------------- matryoshka

  test("truncation at the full width reports zero cosine deviation") {
    import spark.implicits._
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 3f))
    }.toDF("vec_id", "embedding")
    val got = Matryoshka.truncationReport(vecs, "vec_id", "embedding", Seq(4, 8))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(_._1) == List(4, 8))
    assert(got.forall(_._2 == 10L))
    assert(got(1)._3 == 0.0)     // d = full width → identical cosine
    assert(got(0)._3 > 0.0)      // d = 4 loses structure on this data
  }

  // -------------------------------------------------------------- cms

  test("count-min estimates obey the one-sided epsilon-N guarantee") {
    import spark.implicits._
    val df = (0 until 3000).map(i => s"k${i % 11}").toDF("k")
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = exact.keys.toSeq.sorted
    val got = Sketches.cmsEstimates(df, "k", probes, eps = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (k, est, total) =>
      assert(total == 3000L)
      assert(est >= exact(k), s"$k undercount")
      assert(est <= exact(k) + math.ceil(0.01 * 3000).toLong, s"$k overcount")
    }
  }

  test("portable count-min matches exact counts when buckets are sparse " +
       "and only ever overcounts when they collide") {
    import spark.implicits._
    val df = (0 until 3000).map(i => s"k${i % 11}").toDF("k")
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = exact.keys.toSeq.sorted :+ "absent_key"
    // wide sketch: 11 keys over depth 5 x width 2048 — collision odds per
    // row ~11/2048, and the min over 5 independent rows makes a wrong
    // estimate for ANY probe a ~1e-11 event; assert exact equality
    val got = Sketches.cmsEstimatesPortable(df, "k", probes)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == probes.length)
    got.foreach { case (k, est, total) =>
      assert(total == 3000L)
      assert(est == exact.getOrElse(k, 0L), s"$k estimate $est")
    }
    // narrow sketch (width 2): every key collides — the CMS one-sided
    // guarantee still holds (estimate >= exact, <= total)
    val tight = Sketches.cmsEstimatesPortable(df, "k", probes.init,
        depth = 3, width = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    tight.foreach { case (k, est) =>
      assert(est >= exact(k), s"$k undercount at width 2")
      assert(est <= 3000L, s"$k above total")
    }
  }

  test("portable HLL tracks exact distincts within the published error " +
       "and takes the linear-counting branch at small cardinality") {
    import spark.implicits._
    // two keys: one small (linear-counting regime), one big
    val rows = (0 until 200).map(i => ("small", s"u${i % 37}")) ++
      (0 until 60000).map(i => ("big", s"v${i % 20000}"))
    val df = rows.toDF("k", "u")
    val got = Sketches.hllPortable(df, "k", "u")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // m=4096: relative stderr 1.04/sqrt(m) = 1.6%; allow 5 sigma
    assert(math.abs(got("big")._2 - 20000) / 20000.0 < 0.082,
      s"big estimate ${got("big")._2}")
    // 37 distinct over 4096 registers: the small-range branch is exact
    // to well under one count at this occupancy
    assert(math.abs(got("small")._2 - 37) < 1.0, s"small ${got("small")._2}")
    assert(got("small")._1 <= 37L) // nset can't exceed the distinct count
    // deterministic rerun
    val again = Sketches.hllPortable(df, "k", "u")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again("big") == got("big")._2 && again("small") == got("small")._2)
  }

  test("portable HLL rollup: day-merged registers equal the direct sketch") {
    import spark.implicits._
    // users recur across days — the union must dedup them, not sum days
    val rows = for (d <- 1 to 5; i <- 0 until 300)
      yield ("t", java.sql.Timestamp.valueOf(f"2024-03-0$d 10:00:00"),
        s"u${(i + d * 37) % 500}")
    val df = rows.toDF("k", "ts", "u")
    val roll = Sketches.hllPortableRollup(df, "k", "ts", "u").head()
    assert(roll.getLong(1) == 5L, s"n_days ${roll.getLong(1)}")
    val direct = Sketches.hllPortable(df, "k", "u").head().getDouble(2)
    // merging per-day register maxima IS the global register frame
    assert(roll.getDouble(2) == direct,
      s"rollup ${roll.getDouble(2)} != direct $direct")
  }

  test("portable HLL overlap: disjoint sets intersect near 0, " +
       "identical sets near their size") {
    import spark.implicits._
    val rows = (0 until 2000).map(i => ("a", s"u$i")) ++
      (0 until 2000).map(i => ("b", s"u$i")) ++        // b == a
      (0 until 2000).map(i => ("c", s"w$i"))           // c disjoint
    val got = Sketches.hllPortableOverlap(rows.toDF("k", "u"), "k", "u")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("a", "b"))
    assert(ab.getDouble(4) == ab.getDouble(2), "union(a,a) must equal est(a)")
    assert(math.abs(ab.getDouble(5) - 2000) / 2000.0 < 0.1,
      s"identical-set intersection ${ab.getDouble(5)}")
    val ac = got(("a", "c"))
    assert(ac.getDouble(5) < 200, s"disjoint intersection ${ac.getDouble(5)}")
  }

  test("histogram quantiles: exact on bin-aligned data, monotone, " +
       "within one bin of the true quantile") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("k", i.toLong)).toDF("k", "v")
    val got = Sketches.histogramQuantiles(df, "k", "v", 10L, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // true p50 = 500, p90 = 900; estimate must land within one bin width
    assert(math.abs(got(0.5) - 500) <= 10, s"p50 ${got(0.5)}")
    assert(math.abs(got(0.9) - 900) <= 10, s"p90 ${got(0.9)}")
    assert(got(0.5) <= got(0.9), "quantiles must be monotone")
    // partitioning-invariant (mergeable-sketch property)
    val re = Sketches.histogramQuantiles(df.repartition(13), "k", "v", 10L,
      Seq(0.5, 0.9)).collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(re == got)
  }
}
