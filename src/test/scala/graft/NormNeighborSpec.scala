package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analyze.QuantileCut
import graft.dedup.SortedNeighborhood
import graft.text.UnicodeNorm

/** Unicode normalization (native graft_nfc), sorted-neighborhood
  * edit-distance dedup, and per-group winsorization. */
class NormNeighborSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ------------------------------------------------------ NFC normalization

  test("nfc composes combining sequences to precomposed form") {
    val df = Seq(
      (1L, "café"),      // cafe + combining acute -> café
      (2L, "café"),            // already precomposed
      (3L, "plain ascii"),
      (4L, "Å")               // A + ring -> Å
    ).toDF("id", "s")
    val got = df.select(col("id"), UnicodeNorm.nfc(col("s")).as("n"))
      .orderBy("id").as[(Long, String)].collect()
    assert(got(0)._2 == "café")
    assert(got(1)._2 == "café")     // idempotent on normalized input
    assert(got(2)._2 == "plain ascii")
    assert(got(3)._2 == "Å")
    // decomposed and precomposed inputs now hash identically — the dedup
    // property the normalization exists for
    assert(got(0)._2 == got(1)._2)
  }

  test("nfc null/empty safety and SQL-surface resolution") {
    val df = Seq((1L, null: String), (2L, "")).toDF("id", "s")
    val got = df.select(col("id"), UnicodeNorm.nfc(col("s")).as("n"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(1).getString(1) == "")
    // resolves as a built-in through GraftExtensions (SQL text, no
    // per-query registration)
    val viaSql = spark.sql("SELECT graft_nfc('é') AS n").head.getString(0)
    assert(viaSql == "é")
  }

  test("canonicalize is idempotent and strips controls") {
    val df = Seq((1L, "a\u0000b\u0007c   d\u0301\te")).toDF("id", "s")
    val once = df.select(UnicodeNorm.canonicalize(col("s")).as("c"))
    val twice = once.select(UnicodeNorm.canonicalize(col("c")).as("c"))
    val (o, t) = (once.head.getString(0), twice.head.getString(0))
    assert(o == t)
    assert(!o.exists(ch => ch < ' ' && ch != '\n' && ch != '\t' && ch != '\r'))
  }

  // --------------------------------------------- sorted neighborhood dedup

  test("sorted-neighborhood pairs match brute force within the window") {
    // crafted corpus: near-identical strings sharing sort prefixes
    val docs = Seq(
      (10L, "alpha document one shared body"),
      (11L, "alpha document one shared bodY"),   // 1 edit from 10
      (12L, "alpha document two shared body"),   // 1 edit from 10
      (20L, "beta completely different text"),
      (21L, "beta completely different texts"),  // 1 edit from 20
      (30L, "gamma unrelated payload")
    ).toDF("doc_id", "text")
    val key = substring(col("text"), 1, 10)
    val got = SortedNeighborhood.editDistancePairs(
        docs, "doc_id", key, col("text"), window = 2, maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force over the same (key, id) order, same window, same cutoff
    val rows = docs.select(col("doc_id"), key.as("k"), col("text"))
      .as[(Long, String, String)].collect()
      .sortBy(r => (r._2, r._1))
    val brute = (for {
      i <- rows.indices; j <- (i + 1) to math.min(i + 2, rows.length - 1)
      d = {
        val (a, b) = (rows(i)._3, rows(j)._3)
        // Levenshtein via DP (tiny inputs)
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (x, y) =>
          if (x == 0) y else if (y == 0) x else 0 }
        for (x <- 1 to a.length; y <- 1 to b.length)
          dp(x)(y) = math.min(math.min(dp(x - 1)(y) + 1, dp(x)(y - 1) + 1),
            dp(x - 1)(y - 1) + (if (a(x - 1) == b(y - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      if d <= 2
    } yield (math.min(rows(i)._1, rows(j)._1), math.max(rows(i)._1, rows(j)._1))).toSet
    assert(got == brute)
    assert(got.contains((10L, 11L)) && got.contains((20L, 21L)))
    assert(!got.exists { case (a, b) => (a < 20 && b >= 20) || (a < 30 && b >= 30) })
  }

  test("sorted-neighborhood determinism across partitionings") {
    val base = (1L to 60L).map(i => (i, s"doc ${i % 7} body variant ${i % 3}"))
    val one = SortedNeighborhood.editDistancePairs(
      base.toDF("doc_id", "text").repartition(1), "doc_id",
      substring(col("text"), 1, 6), col("text"), 3, 8)
      .orderBy("id_a", "id_b").collect().toSeq
    val many = SortedNeighborhood.editDistancePairs(
      base.toDF("doc_id", "text").repartition(13), "doc_id",
      substring(col("text"), 1, 6), col("text"), 3, 8)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(one == many && one.nonEmpty)
  }

  // ------------------------------------------------------------- winsorize

  test("winsorize clamps exactly into the group percentile band") {
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "g", "v")
    val got = QuantileCut.winsorize(df, "g", "v", 0.05, 0.95)
      .select("id", "value_w").as[(Long, Double)].collect().toMap
    // exact linear-interp percentiles of 1..100: p05 = 5.95, p95 = 95.05
    assert(math.abs(got(1L) - 5.95) < 1e-9)      // below lo -> lo
    assert(math.abs(got(100L) - 95.05) < 1e-9)   // above hi -> hi
    assert(got(50L) == 50.0)                     // interior untouched
    // mass outside the band is exactly the clamped tails
    assert(got.values.count(v => v == 5.95) == 5)
    assert(got.values.count(v => v == 95.05) == 5)
  }

  test("mojibakeReport counts artifact chars and affected docs per group") {
    import graft.text.UnicodeNorm
    val df = Seq(
      (1L, "s1", "clean text here"),
      (2L, "s1", "double dÃ©codÃ© text"),     // 2 artifacts
      (3L, "s1", "lost � twice �"), // 2 artifacts
      (4L, "s2", "perfectly fine")
    ).toDF("doc_id", "source", "text")
    val got = UnicodeNorm.mojibakeReport(df, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val s1 = got("s1")
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("affected_docs") == 2L)
    assert(s1.getAs[Long]("artifact_chars") == 4L)
    assert(got("s2").getAs[Long]("affected_docs") == 0L)
    assert(got("s2").getAs[Double]("affected_rate") == 0.0)
  }

  test("winsorize groups are independent") {
    val df = ((1 to 10).map(i => (i.toLong, "a", i.toDouble)) ++
      (1 to 10).map(i => (100 + i.toLong, "b", 1000 + i.toDouble)))
      .toDF("id", "g", "v")
    val got = QuantileCut.winsorize(df, "g", "v", 0.1, 0.9)
      .select("g", "value_w").as[(String, Double)].collect()
    assert(got.filter(_._1 == "a").forall(_._2 <= 10.0))
    assert(got.filter(_._1 == "b").forall(_._2 >= 1000.0))
  }
}
