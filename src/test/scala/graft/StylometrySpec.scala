package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Stylometry

/** Burrows' Delta stylometry (q314). */
class StylometrySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("identical styles score zero; a divergent style scores higher") {
    import spark.implicits._
    val docs = Seq(
      ("A", "the cat sat on the mat and the dog ran"),
      ("A", "the cat and the dog sat on a mat"),
      ("B", "the cat sat on the mat and the dog ran"),
      ("B", "the cat and the dog sat on a mat"),
      ("C", "quantum flux entangles the manifold over hilbert spaces"),
      ("C", "gauge symmetry breaks the lagrangian under renormalization"))
      .toDF("source", "text")
    val r = Stylometry.burrowsDelta(docs, "source", "text", 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(3)))
    val m = r.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("A", "B")) == 0.0)
    assert(m(("A", "C")) > 0.5 && m(("B", "C")) > 0.5)
    assert(m(("A", "C")) == m(("B", "C"))) // symmetry of identical twins
  }

  test("delta is invariant to source volume (relative frequencies)") {
    import spark.implicits._
    // B is A's text repeated 5x: same relative profile → delta 0
    val base = "alpha beta beta gamma gamma gamma"
    val docs = (Seq(("A", base)) ++ Seq.fill(5)(("B", base)) ++
      Seq(("C", "delta delta epsilon zeta zeta zeta zeta")))
      .toDF("source", "text")
    val r = Stylometry.burrowsDelta(docs, "source", "text", 8)
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getDouble(3))).toMap
    assert(r(("A", "B")) == 0.0)
    assert(r(("A", "C")) > 0.0)
  }
}
