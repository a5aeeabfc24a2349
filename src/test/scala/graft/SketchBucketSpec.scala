package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("HLL rollup: union of daily sketches ≈ direct distinct (merge law)") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      (s"d${i % 7}", (i * 131) % 900L) // 900 distinct users over 7 days
    }
    val daily = rows.toDF("day", "user").groupBy(col("day"))
      .agg(hll_sketch_agg(col("user"), lit(12)).as("sk"))
    val merged = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).cast("long"))
      .head().getLong(0)
    val exact = rows.map(_._2).distinct.size
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged $merged vs exact $exact")
  }

  test("HLL approx distinct within rsd-scaled error of exact") {
    import spark.implicits._
    val events = Tables.events(spark, TestSession.sf)
    val approx = Sketches.approxDistinctPerKey(events, "event_type", "user_id")
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_distinct"))
    val joined = approx.join(exact, "event_type").collect()
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_distinct").toDouble
      val e = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(a - e) / e < 0.15, s"approx $a too far from exact $e")
    }
  }

  test("HLL pairwise set ops: union + inclusion-exclusion track exact overlap") {
    import spark.implicits._
    // sets: A = 0..599, B = 300..899 → |A∪B| = 900, |A∩B| = 300
    val rows = (0 until 600).map(i => ("a", i.toLong)) ++
      (300 until 900).map(i => ("b", i.toLong))
    val sk = rows.toDF("t", "user").groupBy(col("t"))
      .agg(hll_sketch_agg(col("user"), lit(12)).as("sk"))
    val a = sk.where(col("t") === "a").select(col("sk").as("ska"))
    val b = sk.where(col("t") === "b").select(col("sk").as("skb"))
    val r = a.crossJoin(b).select(
      hll_sketch_estimate(col("ska")).as("ea"),
      hll_sketch_estimate(col("skb")).as("eb"),
      hll_sketch_estimate(hll_union(col("ska"), col("skb"))).as("eu")).head
    val (ea, eb, eu) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(math.abs(eu - 900).toDouble / 900 < 0.05, s"union est $eu")
    val inter = ea + eb - eu
    assert(math.abs(inter - 300).toDouble / 300 < 0.15,
      s"inclusion-exclusion intersect $inter")
  }

  test("half-life decay: events a half-life apart weigh 2:1") {
    import spark.implicits._
    import java.sql.Timestamp
    // anchor event at t0, one event 7 days earlier (weight 1/2), one 14
    // days earlier (weight 1/4): score = 1 + 0.5 + 0.25
    val t0 = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    val rows = Seq(0, 7, 14).map(d =>
      (1L, "x", Timestamp.valueOf(t0.minusDays(d))))
    val df = rows.toDF("event_id", "event_type", "ts")
    val got = graft.analyze.Growth.decayedPopularity(df, "event_type", "ts", 7.0)
      .head.getAs[Double]("decayed_score")
    assert(got == 1.75)
  }

  test("approx quantiles bracket the exact median") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSession.sf)
    val q = Sketches.approxQuantilesPerKey(li, "l_returnflag", "l_quantity", Seq(0.5))
      .select($"l_returnflag", element_at($"quantiles", 1).as("p50")).collect()
    q.foreach { r =>
      val p50 = r.getDouble(1)
      assert(p50 >= 20 && p50 <= 30, s"median quantity $p50 implausible (uniform 1..50)")
    }
  }
}

/** Bucketing: pre-shuffled storage layout so co-located joins skip the
  * exchange entirely — the cluster-scale answer to repeated fact-fact
  * joins on the same key. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    import spark.implicits._
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf and cannot be set on a live session
    val li = Tables.lineitem(spark, TestSession.sf).select($"l_orderkey", $"l_quantity")
    val or = Tables.orders(spark, TestSession.sf).select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    or.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("or_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("or_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join must pick SMJ — bucketing removes its exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
    }
  }
}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // heavily skewed fact: 90% of rows share one key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, s"v$i"))
      .toDF("k", "payload")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("dk", "dval")
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"payload", $"dval").collect().map(_.toString).sorted
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", "dk", 8)
      .select($"k", $"payload", $"dval").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join resolves identically-named keys on both sides") {
    import spark.implicits._
    val fact = (1 to 500).map(i => (i.toLong % 5, s"v$i")).toDF("k", "payload")
    val dim = (0L to 4L).map(k => (k, s"dim$k")).toDF("k", "dval")
    val plain = fact.join(dim.withColumnRenamed("k", "dk"), $"k" === $"dk")
      .select($"payload", $"dval").collect().map(_.toString).sorted
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", "k", 4)
      .select($"payload", $"dval").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("keyReport hand-computed stats on a known skewed frame") {
    import spark.implicits._
    // key "a" x 6, "b" x 2, "c" x 2 → 10 rows, 3 keys, mean 3.3333,
    // max 6, skew_ratio = 6*3/10 = 1.8; top key "a"
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = graft.operators.Skew.keyReport(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Double]("mean_sz") === 3.3333)
    assert(r.getAs[Double]("p50_sz") === 2.0)
    assert(r.getAs[Long]("max_sz") === 6L)
    assert(r.getAs[String]("top_key") === "a")
    assert(r.getAs[Long]("top_n") === 6L)
    assert(r.getAs[Double]("skew_ratio") === 1.8)
    // ties on group size resolve to the smallest key
    val tied = Seq("x", "x", "y", "y").toDF("k")
    val t = graft.operators.Skew.keyReport(tied, "k").collect().head
    assert(t.getAs[String]("top_key") === "x")
    assert(t.getAs[Double]("skew_ratio") === 1.0)
    // sketch path returns the same integer-exact fields
    val s = graft.operators.Skew.keyReport(df, "k", exact = false)
      .collect().head
    assert(s.getAs[Long]("max_sz") === 6L && s.getAs[Double]("skew_ratio") === 1.8)
  }
}

class SourceOverlapSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("overlap matrix hand-computed jaccard; multiplicity ignored; nulls dropped") {
    import spark.implicits._
    // A: {t1,t2,t3}  B: {t2,t3,t4}  C: {t9} (+ null, dropped)
    // A∩B = 2, A∪B = 4 → 0.5; C shares nothing → no row
    val docs = Seq(
      ("A", "t1"), ("A", "t2"), ("A", "t3"), ("A", "t2"), // dup inside A
      ("B", "t2"), ("B", "t3"), ("B", "t4"),
      ("C", "t9"), ("C", null)
    ).toDF("source", "text")
    val got = graft.dedup.SourceOverlap.overlapMatrix(docs, "source", "text")
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("source_a") === "A" && r.getAs[String]("source_b") === "B")
    assert(r.getAs[Long]("shared") === 2L)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("jaccard") === 0.5)
  }
}
