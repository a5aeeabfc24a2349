package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Repetition

/** Repetition filters: brute-force equivalence of the in-row fold against
  * Scala-side counting, the zero-shuffle plan guard, and threshold
  * behavior on crafted repetitive vs diverse documents. */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def brute(text: String): (Long, Double, Double, Option[Double]) = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    val n = t.size.toLong
    val counts = t.groupBy(identity).map(_._2.size.toLong)
    val bgs = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    val topB = if (n >= 2) Some(bgs.groupBy(identity).map(_._2.size.toLong).max) else None
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (n, r4(counts.size.toDouble / n), r4(counts.max.toDouble / n),
      topB.map(b => r4(b.toDouble / (n - 1))))
  }

  test("tokenStats equals brute-force counting, including 1-token and all-same docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(63)
    val vocab = Vector("a", "b", "cc", "dd", "e")
    val docs = (1L to 200L).map { i =>
      val n = 1 + rnd.nextInt(30)
      i -> (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ (900L -> "solo") :+ (901L -> "x x x x x")
    val got = Repetition.tokenStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == brute(text), s"doc $id '$text': ${got(id)} vs ${brute(text)}")
    }
  }

  test("repetition stats are a pure projection — zero shuffles in the plan") {
    import spark.implicits._
    val df = Seq((1L, "a b a")).toDF("doc_id", "text")
    val plan = Repetition.tokenStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free projection:\n$plan")
    assert(!plan.contains("Generate"), s"expected no explode:\n$plan")
  }

  test("filterRepetitive drops template text, keeps diverse text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "click here click here click here click here click here"),
      (2L, "the quick brown fox jumps over the lazy dog near banks"))
      .toDF("doc_id", "text")
    val kept = Repetition.filterRepetitive(docs, "doc_id", "text")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }
}
