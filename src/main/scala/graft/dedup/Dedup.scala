package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for a training-data pipeline, each designed
  * around its 100 TB shuffle shape:
  *
  *  - '''exact''' ([[exactGroups]]): one hash-shuffle on a 32-byte digest —
  *    the cheapest possible dedup; digest grouping keys are uniform, so no
  *    skew.
  *  - '''MinHash + LSH''' ([[minHashSignatures]], [[lshCandidatePairs]]):
  *    signatures are computed per-row with array expressions (NO
  *    numHashes× row explosion), then only (band, bucket) keys shuffle.
  *    Candidate verification joins back to the token sets.
  *  - '''SimHash''' ([[simHash64]], [[simHashPairs]]): 64-bit fingerprint
  *    per row; Hamming-≤k pairs found by the 4×16-bit pigeonhole band join
  *    (exact for k ≤ 3), `bit_count(a xor b)` verification.
  *  - '''n-gram Jaccard''' ([[tokenJaccardPairs]]): inverted-index
  *    self-join blocking — pairs are only generated for documents sharing
  *    a token, then exact Jaccard filters. (At web scale add prefix
  *    filtering on rare tokens; the join is the documented hotspot.)
  *  - '''embedding near-dup''' ([[embeddingNearDupPairs]]): random
  *    hyperplane signatures bucket the vectors; exact cosine verifies
  *    within buckets.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact (canonicalized) duplicate groups: documents sharing the sorted
    * distinct token-set fingerprint. Returns one row per group with
    * `n_docs >= 2`, the representative (min id) and the fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.setFingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") >= 2)

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles (space-joined), empty array when the document is
    * shorter than `n` tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature: for each of `numHashes` seeds, the minimum
    * `xxhash64(seed, shingle)` over the document's distinct shingles.
    * One array expression per row — no explosion, no shuffle. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame = {
    val sh = array_distinct(shingles(col(textCol), shingleN))
    val seeds = array((0 until numHashes).map(lit): _*)
    val sig = transform(seeds, s => array_min(transform(sh, g => xxhash64(s, g))))
    df.select(col(idCol).as("id"), sig.as("sig"))
      .filter(size(col("sig")) > 0 && !array_contains(transform(col("sig"), x => isnull(x)), true))
  }

  /** LSH banding: split the signature into `bands` bands, hash each band,
    * self-join on (band, bucket). Returns distinct candidate `(id_a, id_b)`
    * pairs (a < b). Only band keys shuffle; signature arrays stay columnar. */
  def lshCandidatePairs(signatures: DataFrame, bands: Int): DataFrame = {
    val rowsPerBand = ceil(size(col("sig")) / lit(bands)).cast("int")
    val banded = signatures.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), b))))
      .toDF("id", "band", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of agreeing
    * components). */
  def minHashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") /
      size(sigA).cast("double")

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * signature-estimated Jaccard filter. */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, shingleN: Int = 3, bands: Int = 16,
                      threshold: Double = 0.7): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, numHashes, shingleN)
    val cands = lshCandidatePairs(sigs, bands)
    cands
      .join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
      .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
      .withColumn("est_jaccard", round(minHashJaccard(col("sig_a"), col("sig_b")), 4))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Exact token-set Jaccard similarity pairs via inverted-index blocking:
    * only documents sharing at least one token are paired. */
  def tokenJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = toks.alias("a")
      .join(toks.alias("b"), col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .withColumn("jaccard", col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens (FNV-1a token hashes, bit-vote
    * aggregation). Deterministic across JVMs. */
  val simHash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) 0L
      else {
        val votes = new Array[Int](64)
        toks.foreach { t =>
          var h = 0xcbf29ce484222325L // FNV-1a 64
          var i = 0
          while (i < t.length) { h ^= t.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
          var b = 0
          while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
        }
        var out = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    }

  /** Hamming-distance ≤ `maxDist` SimHash pairs. Blocking: split the 64-bit
    * fingerprint into 4 16-bit chunks — any pair within distance 3 agrees
    * on ≥1 chunk (pigeonhole), so the chunk equi-join is lossless for
    * `maxDist <= 3`. Verification: `bit_count(a ^ b)`. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk pigeonhole blocking is only exact for maxDist <= 3")
    val hashed = df.select(col(idCol).as("id"),
      simHash64(TextAnalysis.tokens(col(textCol))).as("h"))
    val chunked = hashed.select(col("id"), col("h"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("h"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "h", "chunk_idx", "chunk_val")
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b, col("a.chunk_idx") === col("b.chunk_idx") &&
              col("a.chunk_val") === col("b.chunk_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // --------------------------------------------------- embedding near-dup

  /** Fixed-seed random hyperplanes for sign-LSH. */
  private def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Near-duplicate embedding pairs: sign-LSH bands bucket the vectors
    * (recall < 1 — documented trade; raise `bands` for recall, `bitsPerBand`
    * for precision), exact cosine verifies. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, bands: Int = 8, bitsPerBand: Int = 4,
                            seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, bands * bitsPerBand, seed))
    val sigUdf = udf { (v: Seq[Float]) =>
      val ps = planes.value
      val bits = ps.map { p =>
        var dot = 0.0; var i = 0
        while (i < v.length) { dot += p(i) * v(i); i += 1 }
        if (dot >= 0) 1 else 0
      }
      bits.grouped(bitsPerBand).map(_.foldLeft(0)((acc, b) => (acc << 1) | b)).toArray
    }
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"), sigUdf(col(vecCol)).as("bandSigs"))
    val banded = sigs.select(col("id"), col("v"), posexplode(col("bandSigs")))
      .toDF("id", "v", "band", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.sim.Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
