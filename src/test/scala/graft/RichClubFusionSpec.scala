package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.Privacy
import graft.graph.RichClub
import graft.text.RetrievalFusion

/** Rich-club profile, l-diversity audit, reciprocal-rank fusion
  * (q257/q258/q262). */
class RichClubFusionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("richClub: K4 is a full club at every feasible k, a star never forms one") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val rows = RichClub.coefficients(k4, "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // all degrees 3: k=1,2 keep all 4 nodes and all 6 edges → phi = 1
    assert(rows(1).getLong(1) == 4 && rows(1).getLong(2) == 6 &&
      rows(1).getDouble(3) == 1.0)
    assert(rows(2).getDouble(3) == 1.0)
    // k=3 empties the club → counts 0, phi NULL
    assert(rows(3).getLong(1) == 0 && rows(3).isNullAt(3))
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val s = RichClub.coefficients(star, "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // only the hub survives k=1: N=1 → phi NULL; no club edges anywhere
    assert(s(1).getLong(1) == 1 && s(1).getLong(2) == 0 && s(1).isNullAt(3))
  }

  test("lDiversityReport: homogeneous class is the leak k-anonymity misses") {
    import spark.implicits._
    // class A: 2 rows, one sensitive value (l=1); class B: 3 rows, 3
    // values (l=3) — k-anonymity at k=2 passes BOTH, l-diversity flags A
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"), ("B", "z"))
      .toDF("qi", "s")
    val r = Privacy.lDiversityReport(df, Seq(col("qi")), col("s"), 2L)
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 5)
    assert(r.getLong(2) == 1)       // l_min
    assert(r.getLong(3) == 1 && r.getLong(4) == 2) // class A, its 2 rows
    // and the k-anonymity report indeed sees nothing at k=2
    assert(Privacy.kAnonymityReport(df, Seq(col("qi")), 2L)
      .collect().head.getLong(3) == 0)
  }

  test("rrf: hand-fused two runs with k0=1") {
    import spark.implicits._
    val r1 = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("qid", "doc_id", "rank")
    val r2 = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("qid", "doc_id", "rank")
    val out = RetrievalFusion.rrf(Seq(r1, r2), 1, 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // doc20: 1/3 + 1/2 = 0.833333; doc10: 1/2; doc30: 1/3
    assert(out.toSeq == Seq((20L, 2L, 0.833333, 1L),
      (10L, 1L, 0.5, 2L), (30L, 1L, 0.333333, 3L)))
  }

  test("overlapTopK: ranks by distinct-token overlap with doc-id ties") {
    import spark.implicits._
    val docs = Seq((1L, "red fox jumps"), (2L, "red red fox"), (3L, "blue sky"))
      .toDF("doc_id", "text")
    val qs = Seq((100L, "red fox")).toDF("qid", "qtext")
    val out = RetrievalFusion.overlapTopK(docs, "doc_id", "text", qs,
      "qid", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // docs 1 and 2 both overlap on {red, fox} (duplicates collapse);
    // doc 3 never appears (zero score excluded); tie → doc 1 first
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L)))
  }
}
