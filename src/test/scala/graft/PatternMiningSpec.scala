package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.{Expectations, Itemsets, Paths, RobustStats}
import graft.graph.LabelPropagation

/** Round-7 batch-3 additions: frequent itemsets/sequences, entry paths,
  * MAD outliers, expectations, label propagation. */
class PatternMiningSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------ itemsets

  test("frequentPairs counts exact basket co-occurrence") {
    import spark.implicits._
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"), // dup (1,a) must not double-count
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "c")
    ).toDF("e", "item")
    val got = Itemsets.frequentPairs(df, "e", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 2L)))
  }

  test("associationRules: confidence and lift from exact supports") {
    import spark.implicits._
    // baskets: {a,b} ×3, {a} ×1, {b,c} ×1  → N=5, supp a=4, b=4, c=1,
    // supp(ab)=3, supp(bc)=1
    val df = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (5L, "b"), (5L, "c")
    ).toDF("e", "item")
    val got = Itemsets.associationRules(df, "e", "item", 1L)
      .select("antecedent", "consequent", "supp_ab", "supp_a", "confidence", "lift")
      .as[(String, String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = got(("a", "b"))
    assert(ab._3 == 3L && ab._4 == 4L)
    assert(ab._5 == 0.75) // 3/4
    assert(ab._6 == math.rint(3.0 * 5 / (4 * 4) * 1e6) / 1e6) // 0.9375
    val cb = got(("c", "b"))
    assert(cb._5 == 1.0) // supp(bc)/supp(c) = 1/1
    assert(cb._6 == 1.25) // 1·5/(1·4)
    // both directions present
    assert(got.contains(("b", "a")) && got.contains(("b", "c")))
  }

  test("infoGain: perfect predictor gains H(label); constant gains 0") {
    import spark.implicits._
    import graft.analyze.Contingency
    val df = (1 to 400).map { i =>
      val y = i % 4 == 0 // 25% positive
      (i.toLong, if (y) "pos" else "neg", "same")
    }.toDF("id", "perfect", "constant")
    val got = Contingency.infoGain(df, col("perfect") === "pos", Seq(
        "perfect" -> col("perfect"), "constant" -> col("constant")))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    val h = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
    val p = got("perfect")
    assert(math.abs(p.getAs[Double]("h_label") - h) < 1e-5)
    assert(math.abs(p.getAs[Double]("info_gain") - h) < 1e-5,
      "perfect predictor must gain the full label entropy")
    assert(p.getAs[Double]("h_cond") == 0.0)
    val c = got("constant")
    assert(math.abs(c.getAs[Double]("info_gain")) < 1e-9,
      "constant feature must gain nothing")
  }

  test("fpGrowth finds the same frequent pairs as the exact lattice level") {
    import spark.implicits._
    val df = (1 to 20).flatMap { e =>
      val items = Seq("x", "y") ++ (if (e % 2 == 0) Seq("z") else Nil)
      items.map(i => (e.toLong, i))
    }.toDF("e", "item")
    val fp = Itemsets.fpGrowth(df, "e", "item", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 20 baskets: {x}, {y}, {x,y} freq 20; {z}, {x,z}, {y,z}, {x,y,z} freq 10
    assert(fp("x") == 20L && fp("y") == 20L && fp("x,y") == 20L)
    assert(fp("z") == 10L && fp("x,z") == 10L && fp("x,y,z") == 10L)
    val pairs = Itemsets.frequentPairs(df, "e", "item", 10L)
      .collect().map(r => (s"${r.getString(0)},${r.getString(1)}", r.getLong(2))).toMap
    Seq("x,y", "x,z", "y,z").foreach(p => assert(fp(p) == pairs(p), p))
  }

  test("prefixSpan respects order: a>b requires a strictly before b") {
    import spark.implicits._
    val df = Seq(
      // user 1: a then b; user 2: b then a; user 3: a then b
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "b"),
      (2L, ts("2024-01-01 00:01:00"), 4L, "a"),
      (3L, ts("2024-01-01 00:00:00"), 5L, "a"),
      (3L, ts("2024-01-01 00:01:00"), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Itemsets.prefixSpan(df, "user_id", "event_type", "ts",
        "event_id", 0.5, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 3L && got("b") == 3L)
    assert(got("a>b") == 2L)
    // minSupport 0.5 of 3 sequences = ceil(1.5) = 2: b>a (freq 1) is dropped
    assert(!got.contains("b>a"))
  }

  test("prefixSpan L2 relational form ≡ spark.ml miner, incl. a>a repeats") {
    import spark.implicits._
    // repeats (a>a for users 1/2), same-ts events disambiguated by the
    // unique event-id tie, and a singleton item
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 3L, "b"), // same ts as event 2
      (2L, ts("2024-01-01 00:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 00:02:00"), 5L, "a"),
      (2L, ts("2024-01-01 00:03:00"), 6L, "c"),
      (3L, ts("2024-01-01 00:00:00"), 7L, "b"),
      (3L, ts("2024-01-01 00:01:00"), 8L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    // maxLen = 3 takes the generic spark.ml path; its length ≤ 2 patterns
    // have maxLen-independent support, so filtering them is exactly the
    // maxLen = 2 result the relational fast path must reproduce
    val generic = Itemsets.prefixSpan(df, "user_id", "event_type", "ts",
        "event_id", 0.5, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter { case (p, _) => p.count(_ == '>') <= 1 }.toMap
    val l2 = Itemsets.prefixSpan(df, "user_id", "event_type", "ts",
        "event_id", 0.5, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(l2 == generic, s"l2=$l2 generic=$generic")
    assert(l2("a>a") == 2L) // the repeat case: first(a) < last(a)
  }

  // --------------------------------------------------------------- paths

  test("entryPaths keys on the exact ordered prefix, short users included") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "v"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "c"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "p"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "x"), // beyond depth, ignored
      (2L, ts("2024-01-01 00:00:00"), 5L, "v"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "c"),
      (2L, ts("2024-01-01 00:02:00"), 7L, "p"),
      (3L, ts("2024-01-01 00:00:00"), 8L, "v") // short path
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Paths.entryPaths(df, "user_id", "event_type", "ts", "event_id", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("v>c>p" -> 2L, "v" -> 1L))
  }

  // ----------------------------------------------------------------- mad

  test("madReport computes exact lower medians and outlier counts") {
    import spark.implicits._
    // values 1..9 plus an outlier 1000: median of 10 = lower median = 5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    val r = RobustStats.madReport(df, "grp", "v", "id").collect().head
    assert(r.getLong(1) == 10)
    assert(r.getDouble(2) == 5.0) // lower median of 1..9,1000
    // deviations from 5: 4,3,2,1,0,1,2,3,4,995 sorted 0,1,1,2,2,3,3,4,4,995
    // lower median (rank 5) = 2
    assert(r.getDouble(3) == 2.0)
    // outliers: dev > 3*2=6 → only 1000
    assert(r.getLong(4) == 1)
  }

  // -------------------------------------------------------- expectations

  test("expectations: one row per rule, NULL predicate counts as failure") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (null, "ok"), (3L, null)
    ).toDF("id", "s")
    val got = Expectations.report(df, Seq(
        "id_not_null" -> col("id").isNotNull,
        "s_is_ok" -> (col("s") === "ok")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("id_not_null", 3L, 1L, math.rint(2.0 / 3.0 * 1e6) / 1e6),
      ("s_is_ok", 3L, 1L, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
  }

  // ----------------------------------------------------------------- lpa

  test("label propagation separates two triangles joined by one bridge") {
    import spark.implicits._
    // triangles {1,2,3} and {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val got = LabelPropagation.run(edges, "a", "b", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // degree-seeded dynamics: each triangle collapses to its hub (the
    // bridge endpoint, degree 3) and the bridge's single vote never
    // outweighs the two intra-triangle votes — communities survive
    assert(Set(1L, 2L, 3L).map(got) == Set(3L))
    assert(Set(10L, 11L, 12L).map(got) == Set(10L))
    assert(got.size == 6)
  }

  test("label propagation: local finisher ≡ distributed dynamics") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L),
      (20L, 21L), (21L, 22L), (20L, 1L)).toDF("a", "b")
    val local = LabelPropagation.run(edges, "a", "b", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    spark.conf.set("graft.lpa.localFinishEdges", "0")
    try {
      val dist = LabelPropagation.run(edges, "a", "b", 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(local == dist)
    } finally spark.conf.unset("graft.lpa.localFinishEdges")
  }

  test("label propagation is invariant to input partitioning") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 20 + 100L)))
      .toDF("a", "b")
    val l1 = LabelPropagation.run(edges.repartition(1), "a", "b", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val l2 = LabelPropagation.run(edges.repartition(13), "a", "b", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(l1 == l2)
  }

  test("trimmed mean ignores the extremes the plain mean is dragged by") {
    import spark.implicits._
    // 1..20 with both tails wild; 5% trim on 22 rows drops exactly 1/end
    val vals = Seq(-10000.0) ++ (1 to 20).map(_.toDouble) ++ Seq(10000.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "v")
    val r = RobustStats.trimmedMean(df, "g", "v", "id", 0.05).collect().head
    assert(r.getLong(1) == 20)
    assert(r.getDouble(2) == 10.5) // mean of 1..20 exactly
  }

  test("KS: identical samples give D = 0; disjoint supports give D = 1") {
    import spark.implicits._
    // ids 2k and 2k+1 carry the same value → the two parity samples are
    // identical distributions
    val same = (0 until 100).map(i => (i.toLong, ((i / 2) % 10).toDouble))
      .toDF("id", "v")
    val r0 = RobustStats.ksTest(same, "v", pmod(col("id"), lit(2)) === 0)
      .collect().head
    assert(r0.getDouble(2) == 0.0)
    val disjoint = ((1 to 50).map(i => (i.toLong * 2, i.toDouble)) ++
      (1 to 50).map(i => (i.toLong * 2 + 1, i + 1000.0))).toDF("id", "v")
    val r1 = RobustStats.ksTest(disjoint, "v", pmod(col("id"), lit(2)) === 0)
      .collect().head
    assert(r1.getDouble(2) == 1.0)
  }
}
