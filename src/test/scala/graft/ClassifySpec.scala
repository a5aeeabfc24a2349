package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Classify

/** Naive Bayes train/eval and DSIR importance weights (q391/q392). */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // two trivially separable "languages"; ids arranged so every class
  // has train rows (id%5<4) and test rows (id%5==4)
  private def corpus = {
    import spark.implicits._
    (0 until 40).map { i =>
      val cls = i % 2
      val txt = if (cls == 0) s"aqua blau cyan tint${i % 3}"
                else s"rot rouge red shade${i % 3}"
      (i.toLong, txt, if (cls == 0) "blue" else "red")
    }.toDF("doc_id", "text", "lang")
  }

  test("naive bayes recovers separable classes on the held-out fold") {
    val out = Classify.naiveBayesEval(corpus, "doc_id", "text", "lang", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq("blue", "red"))
    out.foreach { case (cls, n, ok, acc) =>
      assert(n == 4 && ok == 4 && acc == 1.0, s"class $cls: $n/$ok/$acc")
    }
  }

  test("naive bayes is partitioning-invariant") {
    val a = Classify.naiveBayesEval(corpus, "doc_id", "text", "lang", 5)
      .collect().toSeq
    val b = Classify.naiveBayesEval(corpus.repartition(7), "doc_id",
      "text", "lang", 5).collect().toSeq
    assert(a == b)
  }

  test("dsir ranks target-vocabulary documents first") {
    import spark.implicits._
    // target domain uses a disjoint vocabulary; one raw doc borrows it
    // and must out-rank the plain raw docs
    val docs =
      (0 until 10).map(i => (i.toLong, "lorem ipsum dolor sit", "raw")) ++
      (10 until 20).map(i => (i.toLong, "neural gradient tensor loss", "tgt")) ++
      Seq((20L, "neural gradient tensor loss", "raw"),
          (21L, "lorem ipsum gradient sit", "raw"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = Classify.dsirWeights(df, "doc_id", "text",
      col("source") === "tgt", 256, 22).collect()
    val rank = out.map(_.getLong(0)).zipWithIndex.toMap
    // full-borrow doc 20 ties the target docs at the top; the half-borrow
    // doc 21 beats every plain raw doc; plain raw docs sit at the bottom
    assert(rank(20L) <= 11, s"full-borrow rank ${rank(20L)}")
    assert(rank(21L) < rank(0L) && rank(21L) < rank(9L))
    val logw = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(logw(20L) > logw(21L) && logw(21L) > logw(0L))
    // raw-only docs have NEGATIVE log importance (target assigns their
    // buckets only smoothed mass), target-vocab docs positive
    assert(logw(0L) < 0 && logw(10L) > 0)
  }

  test("margin calibration: deciles partition the held-out fold, accuracy in [0,1]") {
    val out = Classify.marginCalibration(corpus, "doc_id", "text", "lang", 5, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // 8 held-out docs over 4 buckets: every bucket present, counts sum
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(out.map(_._2).sum == 8L)
    out.foreach { case (b, n, lo, hi, acc) =>
      assert(lo <= hi, s"bucket $b: lo $lo > hi $hi")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(lo >= 0.0) // margin = best - second >= 0 by construction
    }
    // separable corpus: the classifier is right everywhere, including
    // the lowest-margin bucket
    assert(out.forall(_._5 == 1.0))
  }

  test("margin calibration is partitioning-invariant") {
    val a = Classify.marginCalibration(corpus, "doc_id", "text", "lang", 5, 4)
      .collect().toSeq
    val b = Classify.marginCalibration(corpus.repartition(7), "doc_id",
      "text", "lang", 5, 4).collect().toSeq
    assert(a == b)
  }
}
