package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.{Contingency, Dependencies}
import graft.text.QueryLikelihood

/** Dirichlet QL retrieval, confusion/MCC, FD + IND audits (q263–q266). */
class DependencyQlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("queryLikelihood: exact-phrase doc outranks partial match; scores are ln-scale negative") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha delta epsilon"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val qs = Seq((9L, "alpha beta")).toDF("qid", "qtext")
    val out = QueryLikelihood.topK(docs, "doc_id", "text", qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1 matches both terms, doc 2 one; doc 3 is never a candidate
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.head._3 > out(1)._3 && out.head._3 < 0)
  }

  test("queryLikelihood: the doc-length prior penalizes a padded copy") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"),
      (2L, "alpha beta " + Seq.fill(50)("filler").mkString(" ")))
      .toDF("doc_id", "text")
    val qs = Seq((9L, "alpha beta")).toDF("qid", "qtext")
    val out = QueryLikelihood.topK(docs, "doc_id", "text", qs, "qid", "qtext", 10)
      .collect().map(_.getLong(1))
    assert(out.head == 1L) // same tf, shorter doc wins under ln(dl+mu)
  }

  test("confusionReport: hand 2x2 with known MCC") {
    import spark.implicits._
    // tp=4, fp=1, fn=2, tn=3: MCC = (12−2)/√(5·6·4·5) = 10/√600
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("p", "a")
    val r = Contingency.confusionReport(df, col("p"), col("a")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 1L, 2L, 3L)))
    assert(math.abs(r.getDouble(4) - 0.8) < 1e-9)           // precision
    assert(math.abs(r.getDouble(5) - 4.0 / 6) < 1e-6)       // recall
    assert(math.abs(r.getDouble(8) - 10.0 / math.sqrt(600)) < 1e-6) // mcc
    // degenerate: all-negative truth → recall/mcc NULL, not NaN
    val deg = Seq((false, false), (true, false)).toDF("p", "a")
    val d = Contingency.confusionReport(deg, col("p"), col("a")).collect().head
    assert(d.isNullAt(5) && d.isNullAt(8))
  }

  test("fdAudit: a key FD holds, a violated one reports its worst lhs") {
    import spark.implicits._
    val df = Seq((1, "a", "x"), (2, "b", "x"), (3, "a", "y"), (3, "a", "y"))
      .toDF("id", "g", "v")
    val out = Dependencies.fdAudit(df, Seq(
        ("id->v", col("id"), col("v")), ("g->v", col("g"), col("v"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("id->v") == ((3L, 0L, 1L, true)))
    // g=a maps to {x,y}: 1 violating lhs of 2, max 2 rhs values
    assert(out("g->v") == ((2L, 1L, 2L, false)))
  }

  test("indAudit: containment holds one way, fails with exact missing count the other") {
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 5L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val out = Dependencies.indAudit(Seq(
        ("child<=parent", child, col("k"), parent, col("k")),
        ("parent<=child", parent, col("k"), child, col("k"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // child distinct {1,2,5}: 5 missing → coverage 2/3
    assert(out("child<=parent") == ((3L, 1L, 0.666667, false)))
    // parent distinct {1,2,3}: 3 missing from child
    assert(out("parent<=child") == ((3L, 1L, 0.666667, false)))
  }
}
