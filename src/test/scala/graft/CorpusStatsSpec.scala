package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Batching
import graft.text.CorpusStats

/** Corpus-level distribution diagnostics (q85-q87): duplicated n-gram
  * mass, length-bucketed batching, per-source TV divergence. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // -------------------------------------------------------- dup n-grams

  test("dup n-gram stats: hand-computed on a crafted corpus") {
    // bigrams: doc1 = [a b, b a, a b] (a b twice WITHIN the doc),
    // doc2 = [a b, b c], doc3 too short to emit any
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    val r = CorpusStats.dupNgramStats(df, "text", 2).collect()(0)
    assert(r.getLong(0) == 5)            // total occurrences
    assert(r.getLong(1) == 3)            // a b / b a / b c
    assert(r.getLong(2) == 1)            // only "a b" repeats
    assert(r.getLong(3) == 3)            // its occurrences
    assert(r.getDouble(4) == 0.6)        // 3/5
  }

  test("dup n-gram stats are partition-invariant") {
    val df = Seq.tabulate(200)(i => (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 7}"))
      .toDF("doc_id", "text")
    val a = CorpusStats.dupNgramStats(df, "text", 3).collect()(0)
    val b = CorpusStats.dupNgramStats(df.repartition(13), "text", 3).collect()(0)
    assert(a == b)
  }

  // --------------------------------------------------- length bucketing

  test("length buckets: batch assignment and pad vs batch max") {
    // width 10, batch 2: ids 1-5 have 3,12,11,4,25 tokens
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),
      (2L, Seq.fill(12)("w").mkString(" ")),
      (3L, Seq.fill(11)("w").mkString(" ")),
      (4L, Seq.fill(4)("w").mkString(" ")),
      (5L, Seq.fill(25)("w").mkString(" "))).toDF("doc_id", "text")
    val got = Batching.lengthBucketBatches(docs, "doc_id",
        size(split(lower(trim(col("text"))), "\\s+")), 10L, 2L)
      .orderBy("doc_id").collect()
    // bucket 0: docs 1(3),4(4) → one batch, max 4 → pads 1,0
    assert(got(0).getLong(2) == 0L && got(0).getLong(3) == 0L && got(0).getLong(4) == 1L)
    assert(got(3).getLong(2) == 0L && got(3).getLong(3) == 0L && got(3).getLong(4) == 0L)
    // bucket 1: docs 2(12),3(11) → one batch, max 12 → pads 0,1
    assert(got(1).getLong(2) == 1L && got(1).getLong(3) == 0L && got(1).getLong(4) == 0L)
    assert(got(2).getLong(2) == 1L && got(2).getLong(3) == 0L && got(2).getLong(4) == 1L)
    // bucket 2: doc 5 alone → pad 0
    assert(got(4).getLong(2) == 2L && got(4).getLong(3) == 0L && got(4).getLong(4) == 0L)
  }

  test("length buckets: batches are contiguous in id order and capped") {
    val docs = Seq.tabulate(100)(i => (i.toLong, Seq.fill(1 + i % 40)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Batching.lengthBucketBatches(docs, "doc_id",
        size(split(lower(trim(col("text"))), "\\s+")), 16L, 8L)
    // no batch exceeds the cap
    val sizes = got.groupBy("bucket", "batch_seq").count().collect()
    assert(sizes.forall(_.getLong(2) <= 8L))
    // within a bucket, batch_seq is non-decreasing in doc_id order and
    // every batch before the last is FULL
    val byBucket = got.collect().groupBy(_.getLong(2))
    byBucket.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
      assert(ordered == ordered.sorted)
      val counts = ordered.groupBy(identity).view.mapValues(_.size).toMap
      val last = counts.keys.max
      counts.filter(_._1 != last).values.foreach(c => assert(c == 8))
    }
    // partition-invariant
    val again = Batching.lengthBucketBatches(docs.repartition(17), "doc_id",
        size(split(lower(trim(col("text"))), "\\s+")), 16L, 8L)
      .orderBy("doc_id").collect().toSeq
    assert(again == got.orderBy("doc_id").collect().toSeq)
  }

  // -------------------------------------------------------- TV distance

  test("source TV divergence: hand-computed two-source corpus") {
    // s1: a a b (3 toks), s2: b c (2 toks); corpus: a:2 b:2 c:1 (C=5)
    // TV(s1) = ½(|2/3−2/5| + |1/3−2/5| + |0−1/5|) = ½(4/15+1/15+3/15) = 4/15
    // TV(s2) = ½(|0−2/5| + |1/2−2/5| + |1/2−1/5|) = ½(6/15+1.5/15+4.5/15) = 0.4
    val df = Seq(("s1", "a a b"), ("s2", "b c")).toDF("source", "text")
    val got = CorpusStats.sourceTvDivergence(df, "source", "text")
      .orderBy("source").collect()
    assert(got(0).getLong(1) == 3L && math.abs(got(0).getDouble(2) - 4.0 / 15) < 5e-7)
    assert(got(1).getLong(1) == 2L && math.abs(got(1).getDouble(2) - 0.4) < 5e-7)
  }

  test("source TV divergence: identical distributions give zero; partition-invariant") {
    val df = Seq.tabulate(60)(i => (s"s${i % 3}", "x y z")).toDF("source", "text")
    val got = CorpusStats.sourceTvDivergence(df, "source", "text").collect()
    assert(got.length == 3 && got.forall(_.getDouble(2) == 0.0))
    val skewed = Seq.tabulate(300)(i =>
      (s"s${i % 4}", s"tok${i % 11} tok${i % 4} tok${(i * 7) % 13}")).toDF("source", "text")
    val a = CorpusStats.sourceTvDivergence(skewed, "source", "text")
      .orderBy("source").collect().toSeq
    val b = CorpusStats.sourceTvDivergence(skewed.repartition(23), "source", "text")
      .orderBy("source").collect().toSeq
    assert(a == b)
  }

  // -------------------------------------------------------- char entropy

  test("docCharEntropy: hand-computed bits") {
    val df = Seq(
      (1L, "aaaa"),      // one symbol -> 0 bits
      (2L, "ab"),        // two equiprobable -> 1 bit
      (3L, "abcd"),      // four equiprobable -> 2 bits
      (4L, "aab")        // H = log2(3) - (2*1 + 1*0)/3
    ).toDF("doc_id", "text")
    val got = CorpusStats.docCharEntropy(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got(0) == ((1L, 4L, 0.0)))
    assert(got(1) == ((2L, 2L, 1.0)))
    assert(got(2) == ((3L, 4L, 2.0)))
    val h3 = math.log(3) / math.log(2) - 2.0 / 3
    assert(math.abs(got(3)._3 - math.rint(h3 * 10000) / 10000) < 1e-9)
    assert(got(3)._2 == 3L)
  }

  test("simpsonIndex: uniform 3x3 gives 0.25, all-same gives 1") {
    val df = Seq((1L, "u", "x x x y y y z z z"), (2L, "m", "x x x x"))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.simpsonIndex(df, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("u").getAs[Double]("simpson") == 0.25) // 3·(3·2)/(9·8)
    assert(got("u").getAs[Double]("inv_simpson") == 4.0)
    assert(got("m").getAs[Double]("simpson") == 1.0)
    assert(got("m").getAs[Long]("n_tokens") == 4L)
  }

  test("vocabRichness: closed corpus f1=0 -> chao1 = vocab, unseen 0") {
    // every token appears >= 3 times: nothing is rare, estimator says done
    val df = Seq((1L, "x x x y y y z z z")).toDF("doc_id", "text")
    val r = CorpusStats.vocabRichness(df, "text").head
    assert(r.getAs[Long]("vocab") == 3L && r.getAs[Long]("f1") == 0L)
    assert(r.getAs[Double]("chao1") == 3.0)
    assert(r.getAs[Double]("gt_unseen_mass") == 0.0)
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing mass") {
    // counts: a:1 b:1 c:2 d:3 → N=7, V=4, f1=2, f2=1
    val df = Seq((1L, "a b c c d d d")).toDF("doc_id", "text")
    val r = CorpusStats.vocabRichness(df, "text").head
    assert(r.getAs[Long]("n_tokens") == 7L && r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("f1") == 2L && r.getAs[Long]("f2") == 1L)
    assert(r.getAs[Double]("chao1") == 4.5) // 4 + 2*1/(2*2)
    assert(r.getAs[Double]("gt_unseen_mass") ==
      math.rint(2.0 / 7 * 1e6) / 1e6)
  }

  test("sourceCosine: identical profiles 1, skewed < 1, disjoint omitted") {
    val df = Seq(
      (1L, "s1", "alpha beta beta"),
      (2L, "s2", "alpha beta beta"),   // identical profile to s1
      (3L, "s3", "alpha alpha alpha"), // shares alpha only
      (4L, "s4", "zeta zeta")          // disjoint vocabulary
    ).toDF("doc_id", "source", "text")
    val got = CorpusStats.sourceCosine(df, "source", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s1", "s2")) == 1.0)
    // s1=(1,2), s3=(3,0): cos = 3/(√5·3) = 1/√5
    assert(math.abs(got(("s1", "s3")) - 1.0 / math.sqrt(5)) < 1e-6)
    assert(!got.keySet.exists(p => p._1 == "s4" || p._2 == "s4"),
      "no-shared-vocabulary pairs are omitted by design")
  }

  test("zipfFit recovers the exponent of a synthetic Zipf corpus") {
    // token t_i repeated floor(2000/i) times: ln(freq) ≈ ln 2000 − ln rank
    val docs = (1 to 200).flatMap { i =>
      val reps = 2000 / i
      Seq.fill(reps)(f"t$i%03d")
    }.grouped(50).zipWithIndex
      .map { case (toks, j) => (j.toLong, toks.mkString(" ")) }.toSeq
    val df = docs.toDF("doc_id", "text")
    val row = CorpusStats.zipfFit(df, "text", 200).head
    assert(row.getAs[Long]("n_terms") == 200L)
    val slope = row.getAs[Double]("slope")
    val r2 = row.getAs[Double]("r2")
    assert(math.abs(slope - (-1.0)) < 0.02, s"slope $slope should be ≈ −1")
    assert(r2 > 0.999, s"synthetic Zipf should fit tightly, r2=$r2")
  }

  test("zipfFit on a uniform corpus has slope ≈ 0") {
    val df = Seq((1L, Seq.tabulate(300)(i => s"u$i u$i u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val row = CorpusStats.zipfFit(df, "text", 300).head
    assert(math.abs(row.getAs[Double]("slope")) < 1e-9)
  }

  test("docCharEntropy flags padding low and diverse text high") {
    val df = Seq(
      (1L, "xxxxxxxxxxxxxxxxxxxx"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val got = CorpusStats.docCharEntropy(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got(0)._3 == 0.0 && got(1)._3 > 3.0)
  }

  // ------------------------------------------------- lexical concentration

  test("lexical concentration: hand-computed Yule's K / Simpson's D / Herdan's C") {
    // tokens: a×4, b×2, c×1, d×1 → N=8, V=4, Σm²Vm = 16+4+1+1 = 22,
    // coincidences Σc(c−1) = 12+2 = 14
    val df = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val r = CorpusStats.lexicalConcentration(df, "text").head
    assert(r.getAs[Long]("n_tokens") == 8L && r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Double]("yule_k") ==
      math.rint((22.0 - 8) / 64 * 1e4 * 1e4) / 1e4)
    assert(r.getAs[Double]("simpson_d") == 0.25)  // 14/56
    assert(math.abs(r.getAs[Double]("herdan_c") -
      math.log(4) / math.log(8)) < 5e-7)
  }

  test("lexical concentration: repetitive text scores far above diverse text") {
    val boiler = Seq((1L, Seq.fill(50)("buy now cheap deal").mkString(" ")))
      .toDF("doc_id", "text")
    val diverse = Seq((1L, (1 to 200).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kb = CorpusStats.lexicalConcentration(boiler, "text")
      .head.getAs[Double]("yule_k")
    val kd = CorpusStats.lexicalConcentration(diverse, "text")
      .head.getAs[Double]("yule_k")
    assert(kb > 1000 && kd == 0.0)
  }

  // ---------------------------------------------------- truncation waste

  test("truncation waste: hand-computed per-source sums at L=3") {
    // src a: lengths 2 and 5 -> kept 2 + 3, cut 2, 1 truncated
    // src b: length 3 exactly -> nothing truncated, zero waste
    val df = Seq(
      (1L, "t1 t2", "a"), (2L, "t1 t2 t3 t4 t5", "a"),
      (3L, "u1 u2 u3", "b")).toDF("doc_id", "text", "source")
    val out = CorpusStats.truncationWaste(df, "source", "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(out.toSeq == Seq(
      ("a", 2L, 1L, 7L, 5L, 2L, 0.2857, 0.5),
      ("b", 1L, 0L, 3L, 3L, 0L, 0.0, 0.0)))
  }

  test("truncation waste is partitioning-invariant") {
    val df = (0 until 50).map(i =>
      (i.toLong, ("w " * (i % 9 + 1)).trim, s"s${i % 3}")).toDF("doc_id", "text", "source")
    val a = CorpusStats.truncationWaste(df, "source", "text", 4).collect().toSeq
    val b = CorpusStats.truncationWaste(df.repartition(7), "source", "text", 4)
      .collect().toSeq
    assert(a == b)
  }
}
