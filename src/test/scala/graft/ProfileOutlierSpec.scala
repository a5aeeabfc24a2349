package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Outliers, Profile}

/** Table profiling and per-group z-score outlier tagging. */
class ProfileOutlierSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("tableStats hand-computed nulls and distincts on any schema") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")), (None, Some("b"))
    ).toDF("x", "s")
    val got = Profile.tableStats(df).orderBy("col_name")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("s", 1L, 2L), ("x", 1L, 2L)))
  }

  test("tableStats sketch path: within HLL error of exact, no Expand replica") {
    val df = (1 to 5000).map(i => (i.toLong, (i % 997).toString, i % 23))
      .toDF("id", "s", "m")
    val exact = Profile.tableStats(df).orderBy("col_name")
      .as[(String, Long, Long)].collect()
    val approx = Profile.tableStats(df, exact = false).orderBy("col_name")
      .as[(String, Long, Long)].collect()
    exact.zip(approx).foreach { case ((c, en, ed), (ca, an, ad)) =>
      assert(c == ca && en == an, "null counts are exact on both paths")
      // approx_count_distinct default rsd = 0.05; allow 4 sigma
      assert(math.abs(ad - ed).toDouble <= math.max(4.0, ed * 0.20),
        s"col $c: approx $ad vs exact $ed outside HLL tolerance")
    }
    // the exact multi-distinct costs one Expand input replica per column;
    // the sketch path must plan WITHOUT Expand (single-replica pass)
    def hasExpand(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.toString.contains("Expand")
    assert(hasExpand(Profile.tableStats(df)),
      "exact path is the Expand multi-distinct (expected)")
    assert(!hasExpand(Profile.tableStats(df, exact = false)),
      "sketch path must not replicate the input via Expand")
  }

  test("zscores: hand-computed scores and flags") {
    // group g: values 1..9 plus an outlier 1000
    val df = ((1 to 9).map(i => (i.toLong, "g", i.toDouble)) :+ (10L, "g", 1000.0))
      .toDF("id", "g", "v")
    val got = Outliers.zscores(df, "g", "v", flagAt = 2.0)
      .select("id", "z", "is_outlier").as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // reference: mean/std from the exact two-pass formula
    val vs = (1 to 9).map(_.toDouble) :+ 1000.0
    val n = vs.length
    val mean = vs.sum / n
    val sd = math.sqrt((vs.map(x => x * x).sum - vs.sum * vs.sum / n) / (n - 1))
    vs.zipWithIndex.foreach { case (v, i) =>
      val expect = BigDecimal((v - mean) / sd)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(i + 1L)._1 - expect) < 1e-9, s"id ${i + 1}")
    }
    assert(got(10L)._2 == 1L)                      // the outlier flags
    assert((1L to 9L).forall(got(_)._2 == 0L))     // nothing else does
  }

  test("groupMean imputation: hand-computed repair, observed rows untouched") {
    val df = Seq(
      (1L, "g", Some(2.0)), (2L, "g", None), (3L, "g", Some(4.0)),
      (4L, "h", Some(10.0)), (5L, "h", None)
    ).toDF("id", "g", "v")
    val got = graft.analyze.Impute.groupMean(df, "g", "v")
      .select("id", "value_i").as[(Long, Double)].collect().toMap
    assert(got(1L) == 2.0 && got(3L) == 4.0 && got(4L) == 10.0)
    assert(got(2L) == 3.0)    // mean of g's observed {2, 4}
    assert(got(5L) == 10.0)   // mean of h's observed {10}
  }

  test("null-group rows are kept (imputed/scored), never dropped") {
    val df = Seq(
      (1L, Some("g"), Some(2.0)), (2L, None, Some(4.0)), (3L, None, None)
    ).toDF("id", "g", "v")
    val imputed = graft.analyze.Impute.groupMean(df, "g", "v")
    assert(imputed.count() == 3)
    // the null group's observed mean (4.0) repairs its own null row
    assert(imputed.filter(col("id") === 3).head.getAs[Double]("value_i") == 4.0)
    val scored = graft.analyze.Outliers.zscores(
      Seq((1L, Some("g"), 1.0), (2L, None, 2.0), (3L, None, 8.0))
        .toDF("id", "g", "v"), "g", "v")
    assert(scored.count() == 3)
    // single-row group g: z undefined -> flag 0, not null
    val g1 = scored.filter(col("id") === 1).head
    assert(g1.getAs[Long]("is_outlier") == 0L)
  }

  test("zscores groups are independent and partitioning-invariant") {
    val base = ((1 to 50).map(i => (i.toLong, "a", (i % 7).toDouble)) ++
      (1 to 50).map(i => (100 + i.toLong, "b", (i % 11).toDouble * 100)))
    val one = Outliers.zscores(base.toDF("id", "g", "v").repartition(1), "g", "v")
      .orderBy("id").collect().toSeq
    val many = Outliers.zscores(base.toDF("id", "g", "v").repartition(13), "g", "v")
      .orderBy("id").collect().toSeq
    assert(one == many)
  }
}
