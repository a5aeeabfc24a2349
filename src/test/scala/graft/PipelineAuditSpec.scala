package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.analyze.{Contingency, Fairness}
import graft.dedup.{CaptureRecapture, LshCurve}
import graft.text.{GoodTuring, ScriptMix}

/** Good-Turing (q334), script mix (q335), capture-recapture (q336),
  * LSH band planner (q337), WoE/IV (q338), fairness report (q339). */
class PipelineAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("good-turing reproduces the hand table for a a a b b c") {
    import spark.implicits._
    val df = Seq("a a a b b c").toDF("text")
    val rows = GoodTuring.goodTuring(df, col("text"), 5).collect()
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    assert(byR(1L).getLong(1) == 1)                      // N1 = 1
    assert(math.abs(byR(1L).getDouble(2) - 2.0) < 1e-9)  // r*=2·N2/N1
    assert(math.abs(byR(2L).getDouble(2) - 3.0) < 1e-9)  // r*=3·N3/N2
    assert(byR(3L).isNullAt(2))                          // no N4
    assert(byR(1L).getLong(3) == 6)
    assert(math.abs(byR(1L).getDouble(4) - 1.0 / 6.0) < 1e-6)
  }

  test("good-turing n=3 counts shingles with multiplicity") {
    import spark.implicits._
    // "x y z x y z x y" → 3-grams: xyz, yzx, zxy, xyz, yzx, zxy →
    // two each of three types: N2 = 3, N = 6
    val df = Seq("x y z x y z x y").toDF("text")
    val rows = GoodTuring.goodTuring(df, col("text"), 5, 3).collect()
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    assert(byR(2L).getLong(1) == 3 && byR(2L).getLong(3) == 6)
  }

  test("script mix counts char classes exactly") {
    import spark.implicits._
    val df = Seq(("en", "ab1 c"), ("en", "zz!")).toDF("lang", "text")
    val r = ScriptMix.scriptMix(df, col("lang"), col("text"))
      .collect().head
    // "ab1 c" + "zz!": 8 chars = 5 latin, 1 digit, 1 space, 1 other
    assert(r.getLong(1) == 2 && r.getLong(2) == 8)
    assert(math.abs(r.getDouble(3) - 5.0 / 8) < 1e-9)   // latin
    assert(math.abs(r.getDouble(4) - 1.0 / 8) < 1e-9)   // digit
    assert(math.abs(r.getDouble(5) - 1.0 / 8) < 1e-9)   // space
    assert(math.abs(r.getDouble(6) - 1.0 / 8) < 1e-9)   // other = '!'
    assert(r.getLong(7) == 0)
  }

  test("script mix flags non-ascii documents") {
    import spark.implicits._
    val df = Seq(("fr", "café"), ("fr", "cafe")).toDF("lang", "text")
    val r = ScriptMix.scriptMix(df, col("lang"), col("text"))
      .collect().head
    assert(r.getLong(7) == 1)
  }

  test("capture-recapture chapman on a crafted two-detector overlap") {
    import spark.implicits._
    val df = Seq(
      (1L, "headAB tail1"), (2L, "headAB tail2"),
      (3L, "foo same-end"), (4L, "bar same-end"),
      (5L, "dupe both ends"), (6L, "dupe both ends"),
      (7L, "unique document x")).toDF("doc_id", "text")
    val r = CaptureRecapture.chapman(df, col("doc_id"), col("text"), 4)
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)   // nA, nB
    assert(r.getLong(2) == 2 && r.getLong(3) == 6)   // overlap, union
    assert(math.abs(r.getDouble(4) - (25.0 / 3 - 1)) < 0.05)
    assert(math.abs(r.getDouble(5) - (25.0 / 3 - 7)) < 0.05)
  }

  test("lsh curve: identical pair lands in the top bin with p(b,r)") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a x y"))
      .toDF("doc_id", "text")
    val rows = LshCurve.curve(df, col("doc_id"), col("text"),
      Seq((16, 2))).collect()
    assert(rows.length == 1)
    val r = rows.head
    // pairs: (1,2) j=1 → bin 9; (1,3),(2,3) j=0.2 → bin 2
    assert(r.getLong(2) == 1 && r.getLong(3) == 2)
    val ps = LshCurve.pTable(16, 2)
    assert(math.abs(r.getDouble(4) - math.round(ps(9) * 1e6) / 1e6) < 1e-4)
    assert(math.abs(r.getDouble(5) -
      math.round(2 * ps(2) * 1e6) / 1e6) < 1e-4)
  }

  test("lsh detect probability is the textbook S-curve") {
    val p = LshCurve.detectProb(0.5, 16, 2)
    assert(math.abs(p - (1.0 - math.pow(1.0 - 0.25, 16))) < 1e-9)
    // monotone in similarity
    val t = LshCurve.pTable(16, 2)
    assert(t.sliding(2).forall(s => s(0) <= s(1)))
  }

  test("woe/iv reproduces the hand-computed two-category table") {
    import spark.implicits._
    val rows = Seq(("X", true), ("X", true), ("X", false), ("X", false),
      ("Y", true), ("Y", false), ("Y", false), ("Y", false))
      .toDF("cat", "y")
    val out = Contingency.woeIv(rows, col("cat"), col("y")).collect()
    val x = out.find(_.getString(0) == "X").get
    assert(math.abs(x.getDouble(4) - math.log(5.0 / 3)) < 1e-5)
    val iv = x.getDouble(6)
    val want = (2.0 / 3 - 2.0 / 5) * math.log(5.0 / 3) +
      (1.0 / 3 - 3.0 / 5) * math.log(5.0 / 9)
    assert(math.abs(iv - want) < 1e-5)
  }

  test("fairness report: rates, equalized odds and the 80% rule column") {
    import spark.implicits._
    // group G1: 4 rows, 2 selected, outcomes: TP 1, FP 1, pos 2
    // group G2: 4 rows, 1 selected (TP), pos 1
    val rows = Seq(
      ("G1", true, true), ("G1", true, false), ("G1", false, true),
      ("G1", false, false),
      ("G2", true, true), ("G2", false, false), ("G2", false, false),
      ("G2", false, false)).toDF("g", "d", "y")
    val out = Fairness.report(rows, col("g"), col("d"), col("y"))
      .collect()
    val g1 = out.find(_.getString(0) == "G1").get
    val g2 = out.find(_.getString(0) == "G2").get
    assert(math.abs(g1.getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(g1.getDouble(4) - 0.5) < 1e-9)   // TPR 1/2
    assert(math.abs(g1.getDouble(5) - 0.5) < 1e-9)   // FPR 1/2
    assert(math.abs(g1.getDouble(6) - 1.0) < 1e-9)   // reference group
    assert(math.abs(g2.getDouble(3) - 0.25) < 1e-9)
    assert(math.abs(g2.getDouble(6) - 0.5) < 1e-9)   // 0.25/0.5
  }
}
