package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.analyze.Survival
import graft.ml.Models
import graft.text.VocabCoverage

/** Round-7 batch-4 additions: vocab coverage, Heaps growth, Kaplan-Meier,
  * GBT. */
class SurvivalVocabSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------ coverage

  test("oovReport: tokens outside the top-k vocab count as OOV") {
    import spark.implicits._
    // "a" ×4, "b" ×3, "rare" ×1 → vocab(2) = {a, b}
    val docs = Seq(
      ("s1", "a a b rare"), ("s1", "a b"), ("s2", "a b")
    ).toDF("source", "text")
    val got = VocabCoverage.oovReport(docs, "source", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("s1", 6L, 1L), ("s2", 2L, 0L)))
  }

  test("oovReport vocab boundary tie breaks on token order") {
    import spark.implicits._
    // "x" and "y" both ×2: vocab(1) under (count desc, token asc) = {x}
    val docs = Seq(("s", "x y x y")).toDF("source", "text")
    val got = VocabCoverage.oovReport(docs, "source", "text", 1)
      .collect().head
    assert(got.getLong(2) == 2L) // both y occurrences OOV
  }

  test("vocabGrowth: first-occurrence buckets, empty buckets present") {
    import spark.implicits._
    // ids 0..9 → bucket == id with 10 buckets; new types at ids 0, 3, 7
    val docs = (0L to 9L).map { i =>
      val t = i match {
        case 0 => "alpha beta"
        case 3 => "alpha gamma"
        case 7 => "delta"
        case _ => "alpha"
      }
      (i, t)
    }.toDF("doc_id", "text")
    val got = VocabCoverage.vocabGrowth(docs, "doc_id", "text", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2) == Seq(2L, 0L, 0L, 1L, 0L, 0L, 0L, 1L, 0L, 0L))
    assert(got.map(_._3) == Seq(2L, 2L, 2L, 3L, 3L, 3L, 3L, 4L, 4L, 4L))
  }

  // ------------------------------------------------------------ survival

  test("kaplanMeier matches the textbook life table on a hand cohort") {
    import spark.implicits._
    // 4 users: deaths at day 1 (u1), day 2 (u2); u3 censored day 2;
    // u4 death day 1 → t=1: d=2, n_risk=4; t=2: d=1, n_risk=2
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-02 06:00:00"), "purchase"),
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-03 00:00:00"), "purchase"),
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-03 00:00:00"), "click"),
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (4L, ts("2024-01-02 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Survival.kaplanMeier(ev, "user_id", "ts",
        col("event_type") === "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // S(1) = 1 - 2/4 = 0.5; S(2) = 0.5 * (1 - 1/2) = 0.25
    assert(got == Seq((1L, 2L, 4L, 0.5), (2L, 1L, 2L, 0.25)))
  }

  test("kaplanMeier: all-censored cohort yields an empty life table") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-05 00:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    assert(Survival.kaplanMeier(ev, "user_id", "ts",
      col("event_type") === "purchase").count() == 0L)
  }

  // --------------------------------------------------------------- gbt

  test("GBT importance concentrates on the label-defining feature") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val sig = i % 4      // label = sig > 1 — fully determined by f1
      val noise = (i * 7) % 5
      (sig.toDouble, noise.toDouble, if (sig > 1) 1.0 else 0.0)
    }
    val df = rows.toDF("f1", "f2", "label")
    val train = Models.assemble(df, Seq("f1", "f2"), "label")
    val model = Models.fitGbt(train, maxIter = 5)
    val imp = Models.gbtImportance(spark, model, Seq("f1", "f2"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(imp.values.sum - 1.0) < 1e-9)
    assert(imp("f1") > 0.9, s"f1 importance ${imp("f1")}")
  }
}
