package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.sources.Tables
import graft.text.{LangId, TextAnalysis}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def docs = Tables.documents(spark, TestSession.sf)

  test("exactGroups: members of a group share identical token sets") {
    import spark.implicits._
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    val joined = docs
      .select($"doc_id", TextAnalysis.setFingerprint($"text").as("fp"),
        array_sort(array_distinct(TextAnalysis.tokens($"text"))).as("set"))
      .join(groups, "fp")
    val bad = joined.groupBy($"fp").agg(countDistinct($"set").as("nsets"))
      .filter($"nsets" > 1).count()
    assert(bad == 0)
    assert(groups.count() > 0)
  }

  test("minhash estimated jaccard tracks exact token jaccard (mean abs err < 0.15)") {
    import spark.implicits._
    val exact = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.0)
      .select($"id_a", $"id_b", $"jaccard".as("exact_j"))
      .limit(2000)
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", numHashes = 64, shingleN = 1)
    val est = exact
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .withColumn("est_j", Dedup.minHashJaccard($"sig_a", $"sig_b"))
    val mae = est.agg(avg(abs($"est_j" - $"exact_j"))).head().getDouble(0)
    assert(mae < 0.15, s"minhash estimator MAE too high: $mae")
  }

  test("tokenJaccardPairs equals brute force at several thresholds (prefix+positional bound is lossless)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 25).map(i => s"w$i")
    // adversarially dense: every doc drawn from a 25-token vocabulary,
    // with duplicated docs to exercise the exact-group pre-collapse
    val base = (1 to 120).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (1 to 30).map(j => (200L + j, base(rnd.nextInt(base.size))._2))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val sets = (base ++ dups).map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSet }.toMap
    for (threshold <- Seq(0.3, 0.6, 0.8, 0.95)) {
      val got = Dedup.tokenJaccardPairs(docs, "doc_id", "text", threshold)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ids = sets.keys.toSeq.sorted
      val brute = (for {
        a <- ids; b <- ids if a < b
        j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
        if j >= threshold
      } yield (a, b)).toSet
      assert(got == brute,
        s"threshold $threshold: missing ${(brute -- got).take(5)} extra ${(got -- brute).take(5)}")
    }
  }

  test("ngramJaccardPairs equals brute force over shingle sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val vocab = (0 until 12).map(i => s"w$i")
    val base = (1 to 80).map { i =>
      (i.toLong, (0 until (4 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (1 to 20).map(j => (200L + j, base(rnd.nextInt(base.size))._2))
    val docs = (base ++ dups).toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] =
      t.toLowerCase.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = (base ++ dups).map { case (id, t) => id -> shingleSet(t) }.toMap
    for (threshold <- Seq(0.5, 0.8)) {
      val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, threshold)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ids = sets.keys.toSeq.sorted
      val brute = (for {
        a <- ids; b <- ids
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
        if j >= threshold
      } yield (a, b)).toSet
      assert(got == brute,
        s"threshold $threshold: missing ${(brute -- got).take(5)} extra ${(got -- brute).take(5)}")
    }
  }

  test("ngramJaccardComponents equals brute-force union-find over the Jaccard graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val vocab = (0 until 12).map(i => s"w$i")
    val base = (1 to 80).map { i =>
      (i.toLong, (0 until (4 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (1 to 25).map(j => (200L + j, base(rnd.nextInt(base.size))._2))
    val docs = (base ++ dups).toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] =
      t.toLowerCase.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = (base ++ dups).map { case (id, t) => id -> shingleSet(t) }
      .filter(_._2.nonEmpty).toMap
    for (threshold <- Seq(0.5, 0.8)) {
      // brute-force union-find over the >= threshold pair graph
      val parent = scala.collection.mutable.Map(sets.keys.map(k => k -> k).toSeq: _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      val ids = sets.keys.toSeq.sorted
      for (a <- ids; b <- ids if a < b) {
        val j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
        if (j >= threshold) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val brute = ids.map(id => id -> find(id)).toMap
      val got = Dedup.ngramJaccardComponents(docs, "doc_id", "text", 3, threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == brute,
        s"threshold $threshold: diffs ${(brute.toSet diff got.toSet).take(5)} / ${(got.toSet diff brute.toSet).take(5)}")
    }
  }

  test("simHashPairs equals brute-force Hamming-<=3 pairs (pigeonhole is lossless)") {
    import spark.implicits._
    val got = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = docs.select($"doc_id",
      Dedup.simHash64(TextAnalysis.tokens($"text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute)
  }

  test("portable hash contracts: md5-prefix parse and affine-mod-(2^61-1) match references") {
    // md5Hash60/28 must equal parsing the first 15/7 hex chars of the
    // md5 digest — the exact ('0x' || substr(md5(x), 1, k))::BIGINT
    // contract the DuckDB oracles compute
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (s <- Seq("", "a", "hello world", "τoken-ünicode", "0_63", "x" * 500)) {
      assert(Dedup.md5Hash60(s) == java.lang.Long.parseLong(md5hex(s).take(15), 16))
      assert(Dedup.md5Hash28(s) == java.lang.Long.parseLong(md5hex(s).take(7), 16))
    }
    // affineMod61's multiplyHigh fold must equal exact BigInt arithmetic
    // (what HUGEINT computes) across the full operand range
    val p = BigInt(Dedup.P61)
    val rnd = new scala.util.Random(61)
    def r61(): Long = rnd.nextLong() >>> 3
    for (_ <- 0 until 2000) {
      val a = r61(); val x = r61(); val b = r61() % Dedup.P61
      val want = ((BigInt(a) * BigInt(x) + BigInt(b)) mod p).toLong
      assert(Dedup.affineMod61(a, x, b) == want, s"a=$a x=$x b=$b")
    }
    // boundary operands
    for ((a, x, b) <- Seq((Dedup.P61 - 1, Dedup.P61 - 1, Dedup.P61 - 1),
        (0L, 0L, 0L), (1L, Dedup.P61, 0L), (Dedup.P61, Dedup.P61, Dedup.P61 - 1))) {
      val want = ((BigInt(a) * BigInt(x) + BigInt(b)) mod p).toLong
      assert(Dedup.affineMod61(a, x, b) == want, s"boundary a=$a x=$x b=$b")
    }
  }

  test("portable simHashPairs equals brute-force Hamming-<=3 over simHash60") {
    import spark.implicits._
    val got = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3, portable = true)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = docs.select($"doc_id",
      Dedup.simHash60(TextAnalysis.tokens($"text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hashes.forall { case (_, h) => h >= 0L && h < (1L << 60) })
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute)
  }

  test("portable minhash estimator tracks exact jaccard; identical docs estimate 1.0") {
    import spark.implicits._
    val exact = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.0)
      .select($"id_a", $"id_b", $"jaccard".as("exact_j"))
      .limit(2000)
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text",
      numHashes = 64, shingleN = 1, portable = true)
    val est = exact
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .withColumn("est_j", Dedup.minHashJaccard($"sig_a", $"sig_b"))
    val mae = est.agg(avg(abs($"est_j" - $"exact_j"))).head().getDouble(0)
    assert(mae < 0.15, s"portable minhash estimator MAE too high: $mae")
    // two token-identical docs must pair with estimate exactly 1.0
    val twins = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "something else entirely here")).toDF("doc_id", "text")
    val pairs = Dedup.minHashLshPairs(twins, "doc_id", "text",
      numHashes = 64, shingleN = 1, bands = 8, threshold = 0.9, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("portable embedding near-dup: no false positives, recall holds") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val thr = 0.2
    val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", thr,
        portable = true)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cos(va, vb) >= thr
    } yield (ia, ib)).toSet
    assert(got.subsetOf(brute), s"false positives: ${(got -- brute).take(5)}")
    if (brute.nonEmpty) {
      val recall = got.size.toDouble / brute.size
      assert(recall > 0.3, s"portable LSH recall too low: $recall")
    }
  }

  test("embedding near-dup LSH finds a usable fraction of true pairs, no false positives") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val thr = 0.2
    val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", thr)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cos(va, vb) >= thr
    } yield (ia, ib)).toSet
    assert(got.subsetOf(brute), s"false positives: ${(got -- brute).take(5)}")
    if (brute.nonEmpty) {
      val recall = got.size.toDouble / brute.size
      assert(recall > 0.3, s"LSH recall too low: $recall (got ${got.size} of ${brute.size})")
    }
  }

  test("bruteTopK is exact (matches local computation)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val got = Similarity.bruteTopK(
        emb.filter($"vec_id" >= 5), "vec_id", "embedding",
        emb.filter($"vec_id" < 5), "vec_id", "embedding", 3)
      .select($"qid", $"id", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    (0L until 5L).foreach { q =>
      val expect = vecs.filter(_._1 >= 5).toSeq
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
      val gotQ = (1 to 3).map(rn => got((q, rn)))
      assert(gotQ == expect, s"query $q: got $gotQ expected $expect")
    }
  }

  test("trigram langid recognizes real language samples") {
    import spark.implicits._
    val samples = Seq(
      ("the quick brown fox jumping over the lazy dog of the farm", "en"),
      ("le chat est sur la table et il mange que de la viande", "fr"),
      ("la casa de los niños es una de las mejores del barrio", "es"),
      ("der Hund und die Katze sind ein schönes Paar in der Schule", "de"),
      ("我是一个学生，在学校里学习了很多的知识", "zh")).toDF("text", "expected")
    val out = samples.select($"expected", LangId.trigramLangId($"text").as("got")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("split leakage: crafted cross-split twin lands in train_test with its test doc counted") {
    import spark.implicits._
    // ids 4 and 9 are TEST (id%5==4); 4 is a near-dup of TRAIN doc 0;
    // 9 is unique; 1 and 2 are near-dup TRAIN twins (train_train)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (0L, shared + " one"), (4L, shared + " two"),
      (1L, "iota kappa lambda mu nu xi omicron pi rho"),
      (2L, "iota kappa lambda mu nu xi omicron pi sigma"),
      (9L, "tau upsilon phi chi psi omega aleph beth gimel")
    ).toDF("doc_id", "text")
    val out = Dedup.splitLeakageReport(df, "doc_id", "text", 3, 0.5, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("test_test", 0L, 0L),
      ("train_test", 1L, 1L),
      ("train_train", 1L, 0L)))
  }
}
