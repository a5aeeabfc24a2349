package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.RetrievalEval

/** MRR / recall / nDCG metric machinery. */
class RetrievalEvalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("unique-token corpus self-retrieves perfectly") {
    import spark.implicits._
    // every doc's tokens are unique to it → rank 1 always
    val docs = (0L until 8L).map(i =>
      (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e filler$i")).toDF("doc_id", "text")
    val r = RetrievalEval.selfRetrievalReport(docs, "doc_id", "text", 2, 5, 10)
      .collect().head
    assert(r.getLong(0) == 4) // docs 0,2,4,6 are queries
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("a dominating distractor demotes the truth to rank 2") {
    import spark.implicits._
    // query = first 5 tokens of doc 0; doc 1 contains ALL of them plus
    // doc-id tiebreak: doc 0 itself also matches all 5 → score tie,
    // doc 0 < 1 wins. So build doc 1 to score HIGHER is impossible with
    // set overlap capped at 5 — instead make doc 0's own text contain
    // only 3 of its query tokens... impossible (query IS its prefix).
    // Achieve rank 2 via the doc-id tie: give doc -? ids: truth qid=2,
    // distractor doc 1 with the same 5 tokens — tie broken by doc asc →
    // doc 1 first, truth rank 2.
    val docs = Seq(
      (1L, "qa qb qc qd qe zzz"),
      (2L, "qa qb qc qd qe yyy")
    ).toDF("doc_id", "text")
    val r = RetrievalEval.selfRetrievalReport(docs, "doc_id", "text", 2, 5, 10)
      .collect().head
    assert(r.getLong(0) == 1) // only doc 2 queries
    assert(r.getDouble(1) == 0.5)          // truth at rank 2 → MRR 1/2
    assert(r.getDouble(2) == 1.0)          // still inside top-10
    assert(r.getDouble(3) == 0.63093)      // literal gain at rank 2, 6 dp... rounded from 0.630929754
  }
}
