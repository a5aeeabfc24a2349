package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{BpeEncoder, BpeTrainer, HeuristicFilters, NgramLm}
import graft.operators.TrainOrder
import graft.sim.{Quantize, Similarity}

/** Round-4 curation operators: C4 heuristic filters, compression-ratio
  * detector, trigram LM scoring, deterministic train ordering/sampling,
  * int8 quantization, hard-negative mining, BPE encoding. */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- C4 stats

  test("c4 stats: hand-computed fields on crafted docs") {
    val df = Seq(
      (1L, "The quick brown fox jumps. It runs away!"),
      (2L, "no terminal punct here"),
      (3L, "code { sample } block."),
      (4L, "Lorem Ipsum dolor sit amet.")
    ).toDF("doc_id", "text")
    val got = HeuristicFilters.stats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: ends '!', 2 sentence runs, 8 words, no markers
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 2 && got(0).getLong(3) == 8)
    assert(got(0).getInt(6) == 0 && got(0).getInt(7) == 0)
    // doc 2: no terminal punctuation, 0 sentences
    assert(got(1).getInt(1) == 0 && got(1).getInt(2) == 0)
    // doc 3: brace marker fires
    assert(got(2).getInt(6) == 1)
    // doc 4: lorem marker fires (case-insensitive)
    assert(got(3).getInt(7) == 1)
  }

  test("c4 filter keeps only gate-passing docs") {
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog."),
      (2L, "short."),                       // < 5 words
      (3L, "A code sample { int x; } here."), // brace
      (4L, "All good sentences end with punctuation marks.")
    ).toDF("doc_id", "text")
    val kept = HeuristicFilters.filterC4(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("compression ratio: repetitive text compresses far below random") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "q7kx92mfp3vz81wjd465ybt0nghcelsaruio ZQXJKVBWMYFPDGHTLCNRSEAOIU")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        HeuristicFilters.compressionRatio(col("text")).as("cr"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(got(1L) < 0.5, s"repetitive doc should compress: ${got(1L)}")
    assert(got(2L) > 0.8, s"high-entropy doc should not: ${got(2L)}")
    // deterministic across evaluations
    val again = df.select(col("doc_id"),
        HeuristicFilters.compressionRatio(col("text")).as("cr"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(got == again)
  }

  // ------------------------------------------------------------ trigram LM

  test("trigram LM: uniform corpus scores 1.0; rare trigrams score lower") {
    // corpus of identical docs: every trigram's conditional prob is 1
    val uni = Seq((1L, "abcabc"), (2L, "abcabc")).toDF("doc_id", "text")
    val s1 = NgramLm.score(uni, "doc_id", "text")
      .as[(Long, Option[Double])].collect().toMap
    assert(s1(1L).contains(1.0) && s1(2L).contains(1.0))
    // doc 3 shares prefix 'ab' but continues differently -> both docs'
    // 'ab?' trigrams split the prefix mass, scores drop below 1
    val mix = Seq((1L, "abc"), (2L, "abd")).toDF("doc_id", "text")
    val s2 = NgramLm.score(mix, "doc_id", "text")
      .as[(Long, Option[Double])].collect().toMap
    assert(s2(1L).exists(_ < 1.0) && s2(2L).exists(_ < 1.0))
    // too-short docs score null, never crash
    val short = Seq((1L, "ab"), (2L, "xyz")).toDF("doc_id", "text")
    val s3 = NgramLm.score(short, "doc_id", "text")
      .as[(Long, Option[Double])].collect().toMap
    assert(s3(1L).isEmpty && s3(2L).isDefined)
  }

  // ------------------------------------------------------- train ordering

  test("epoch shuffle: a permutation, deterministic, epoch-sensitive") {
    val df = (0L until 100L).toDF("id")
    val e1 = TrainOrder.epochShuffle(df, "id", 1)
      .as[(Long, Long)].collect().toMap
    assert(e1.values.toSeq.sorted == (0L until 100L))   // contiguous positions
    val e1b = TrainOrder.epochShuffle(df, "id", 1).as[(Long, Long)].collect().toMap
    assert(e1 == e1b)                                    // reproducible
    val e2 = TrainOrder.epochShuffle(df, "id", 2).as[(Long, Long)].collect().toMap
    assert(e1 != e2)                                     // epoch changes order
    // not the identity order (hash actually shuffles)
    assert(e1.count { case (id, pos) => id == pos } < 20)
  }

  test("per-group sample: exactly k per group, deterministic winners") {
    val df = (0L until 200L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val s = TrainOrder.samplePerGroup(df, "grp", "id", 10)
    val byGroup = s.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGroup.values.forall(_ == 10L) && byGroup.size == 4)
    val again = TrainOrder.samplePerGroup(df, "grp", "id", 10)
      .select("id").as[Long].collect().sorted
    assert(s.select("id").as[Long].collect().sorted.toSeq == again.toSeq)
  }

  // ---------------------------------------------------------- quantization

  test("int8 quantize: values reconstruct within scale/2 per dimension") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.25f, 0.5f, 0.0f)),
      (3L, Array(-1.0f, 0.1f, 0.0f))
    ).toDF("id", "v")
    val err = Quantize.quantError(vecs, "v").orderBy("dim")
      .as[(Int, Double, Double)].collect()
    // dim 0: maxabs 1.0 -> scale 1/127; dim 2 all-zero -> scale 0, mae 0
    assert(math.abs(err(0)._2 - 1.0 / 127) < 1e-6)
    assert(err(2)._2 == 0.0 && err(2)._3 == 0.0)
    // mae bounded by half a quantization step
    assert(err.forall { case (_, scale, mae) => mae <= scale / 2 + 1e-9 })
    val q = Quantize.quantize(vecs, "id", "v").orderBy("id")
      .as[(Long, Array[Int])].collect()
    assert(q(0)._2(0) == 127 && q(2)._2(0) == -127)      // extremes hit the rails
    assert(q.forall(_._2.forall(v => v >= -127 && v <= 127)))
  }

  // ------------------------------------------------------- hard negatives

  test("hard negatives: other-label only, matches brute-force filter") {
    val data = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat), i % 3)
    }.toDF("id", "v", "lbl")
    val queries = data.filter(col("id") < 3)
    val got = Similarity.hardNegatives(
      data.filter(col("id") >= 3), "id", "v", "lbl",
      queries, "id", "v", "lbl", 4)
    val rows = got.select("qid", "id", "lbl", "rn").as[(Long, Long, Int, Int)].collect()
    assert(rows.length == 12)
    // no mined negative shares its anchor's label
    val qlbl = (0 until 3).map(i => i.toLong -> i % 3).toMap
    assert(rows.forall { case (q, _, lbl, _) => lbl != qlbl(q) })
    // equals bruteTopK over the pre-filtered corpus, per anchor
    (0 until 3).foreach { qi =>
      val brute = Similarity.bruteTopK(
        data.filter(col("id") >= 3 && col("lbl") =!= (qi % 3)), "id", "v",
        queries.filter(col("id") === qi), "id", "v", 4)
        .select("id").as[Long].collect().toSet
      val mined = rows.filter(_._1 == qi).map(_._2).toSet
      assert(mined == brute, s"anchor $qi")
    }
  }

  // ----------------------------------------------------------- BPE encode

  test("bpe encodeWord: merge order follows rank, leftmost first") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("c", "d") -> 2)
    assert(BpeEncoder.encodeWord("abcd", ranks).toSeq == Seq("abc", "d"))
    // rank 0 pair absent -> next applicable rank fires
    assert(BpeEncoder.encodeWord("cd", ranks).toSeq == Seq("cd"))
    // no applicable merges -> characters unchanged
    assert(BpeEncoder.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
    // repeated pair merges leftmost-first
    assert(BpeEncoder.encodeWord("ababab", Map(("a", "b") -> 0)).toSeq ==
      Seq("ab", "ab", "ab"))
  }

  test("bpe fertility: trained merges compress the training words") {
    val docs = Seq(
      (1L, "banana banana banana"),
      (2L, "bandana")
    ).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", 10)
    val stats = BpeEncoder.encodeStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
    // doc 1's only word is fully merged into one token after 10 merges
    assert(stats(0)._2 == 3L && stats(0)._3 == 3L)
    assert(stats(0)._4.contains(1.0))
    // fertility = subwords / words, and subwords never exceeds chars
    assert(stats.forall { case (_, w, s, _) => s >= w })
  }
}
