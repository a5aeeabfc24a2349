package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

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
}
