package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Dsir

/** DSIR hashed importance resampling (q413). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Independent reimplementation of the operator's math: portable
    * md5-32 bucket hash, Laplace-smoothed log ratio pinned at 12 dp,
    * exact long doc sums. */
  private def bruteLogw(docs: Seq[(Long, Boolean, String)], buckets: Int,
                        alpha: Double): Map[Long, Long] = {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d, 16)
    }
    def feats(text: String): Seq[Long] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val bis = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      (toks ++ bis).map(g => h32(g) % buckets)
    }
    val all = docs.map { case (id, t, s) => (id, t, feats(s)) }
    val ct = new Array[Long](buckets); val cr = new Array[Long](buckets)
    all.foreach { case (_, t, fs) =>
      fs.foreach { b => cr(b.toInt) += 1; if (t) ct(b.toInt) += 1 }
    }
    val ctt = ct.sum.toDouble; val crt = cr.sum.toDouble
    def lam12(b: Int): Long = {
      val x = ((ct(b) + alpha) / (ctt + alpha * buckets)) /
        ((cr(b) + alpha) / (crt + alpha * buckets))
      val v = math.log(x) * 1e12
      if (v >= 0) math.round(v) else -math.round(-v)
    }
    all.map { case (id, _, fs) => id -> fs.map(b => lam12(b.toInt)).sum }.toMap
  }

  test("dsir: matches brute-force math; target twin outranks off-target") {
    import spark.implicits._
    val docs = Seq(
      (1L, true, "alpha beta alpha"),
      (2L, false, "alpha beta alpha"),      // token-identical to the target doc
      (3L, false, "gamma delta epsilon"),   // disjoint vocabulary
      (4L, false, "alpha gamma"),           // mixed
      (5L, true, "beta beta gamma"))
    val df = docs.map { case (id, t, s) => (id, if (t) "en" else "de", s) }
      .toDF("doc_id", "lang", "text")
    val out = Dsir.topKByImportance(df, "doc_id", "text",
        col("lang") === "en", buckets = 64, alpha = 0.5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val brute = bruteLogw(docs, 64, 0.5)
    val expected = docs.map(_._1).sortBy(id => (-brute(id), id))
    assert(out.map(_._1).toSeq == expected, s"rank order: ${out.toSeq}")
    out.foreach { case (id, _, logw, _) =>
      val want = math.rint(brute(id).toDouble / 1e12 * 1e4) / 1e4
      assert(math.abs(logw - want) < 1e-9, s"doc $id: $logw vs $want")
    }
    // identical text ⇒ identical weight regardless of membership; the
    // disjoint-vocab doc must score strictly lower than the target twin
    val byId = out.map(o => o._1 -> o._3).toMap
    assert(byId(1L) == byId(2L))
    assert(byId(3L) < byId(2L))
    // in_target flags reflect the predicate
    assert(out.collect { case (id, t, _, _) if t == 1L => id }.toSet == Set(1L, 5L))
  }

  test("dsir: empty target fails loudly; k caps the output") {
    import spark.implicits._
    val df = Seq((1L, "de", "a b"), (2L, "de", "c d")).toDF("doc_id", "lang", "text")
    val err = intercept[IllegalArgumentException] {
      Dsir.topKByImportance(df, "doc_id", "text", col("lang") === "en").collect()
    }
    assert(err.getMessage.contains("empty target"))
    val capped = Dsir.topKByImportance(df, "doc_id", "text",
      col("lang") === "de", buckets = 16, alpha = 1.0, k = 1).collect()
    assert(capped.length == 1 && capped.head.getLong(3) == 1L)
  }
}
