package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer trainer (Kudo 2018, the SentencePiece
  * unigram model) — the OTHER major tokenizer family next to the BPE
  * trainer ([[BpeTrainer]]): instead of greedy merges, a probabilistic
  * piece inventory where each word's segmentation is the Viterbi-best
  * under piece unigram probabilities, refit by EM.
  *
  *  1. '''fold''': the corpus collapses ONCE to the distinct-word
  *     frame with counts (language-bounded, never corpus-bounded) —
  *     every later pass runs over words × their counts.
  *  2. '''seed''': all substrings up to `maxPieceLen` weighted by word
  *     count; the top `vocabSize` by (freq, piece) plus every single
  *     character (coverage guarantee) form the initial inventory.
  *  3. '''EM''': per round, the E-step Viterbi-segments each distinct
  *     word under the broadcast piece log-probs (a Scala UDF — the
  *     honest rung-(d) choice: a per-word dynamic program has no
  *     builtin/Expression form, and it runs on the WORD frame, not the
  *     corpus), pieces collect word-count-weighted counts in one
  *     vocab-bounded aggregate; the M-step renormalizes. Single-char
  *     pieces keep an ε floor so no word ever becomes unsegmentable.
  *
  * Determinism: Viterbi ties break toward the SMALLER split point
  * (longest final piece), and the final ranking orders by (count desc,
  * piece asc) — a pure function of the corpus. Output: top `topK`
  * pieces `(piece, count, prob)` with prob at 6 dp.
  *
  * Scale shape: one corpus shuffle (the word fold); seed explode, EM
  * aggregates and the collects are all bounded by |distinct words| ×
  * word length or |vocab| — the SentencePiece trade, distributed.
  */
object UnigramLm {

  def train(df: DataFrame, textCol: String, vocabSize: Int = 512,
            maxPieceLen: Int = 4, rounds: Int = 3, topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val spark = df.sparkSession
    import spark.implicits._
    val (words, mass10, total10, counts) =
      fit(df, textCol, vocabSize, maxPieceLen, rounds)
    words.unpersist(blocking = false)
    val rows = mass10.toSeq
      .map { case (p, m) => (p, counts.getOrElse(p, 0L),
        m.toDouble / total10) }
      .sortBy { case (p, c, _) => (-c, p) }
      .take(topK)
    rows.toDF("piece", "count", "prob")
      .select(col("piece"), col("count"), round(col("prob"), 6).as("prob"))
  }

  /** Corpus tokenization-efficiency report under the trained inventory —
    * the unigram-side sibling of the BPE fertility readout (q84): each
    * DISTINCT word Viterbi-encodes once, stats weight by word count.
    * One row: `(n_words, total_words, total_pieces, pieces_per_word,
    * chars_per_piece)` at 4 dp. */
  def fertility(df: DataFrame, textCol: String, vocabSize: Int = 512,
                maxPieceLen: Int = 4, rounds: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val (words, mass10, total10, _) = fit(df, textCol, vocabSize, maxPieceLen, rounds)
    val lp = logp9(mass10, total10)
    val bc = spark.sparkContext.broadcast(lp)
    val nPieces = udf((w: String) => viterbiPieces(w, bc.value, maxPieceLen).length)
    val out = words
      .select(col("wc"), length(col("w")).cast("long").as("chars"),
        nPieces(col("w")).cast("long").as("np"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("wc")).as("total_words"),
        sum(col("wc") * col("np")).as("total_pieces"),
        sum(col("wc") * col("chars")).as("__chars"))
      .select(col("n_words"), col("total_words"), col("total_pieces"),
        round(col("total_pieces").cast("double") /
          col("total_words"), 4).as("pieces_per_word"),
        round(when(col("total_pieces") > 0,
          col("__chars").cast("double") / col("total_pieces")), 4)
          .as("chars_per_piece"))
    // lazy unpersist: the frame recomputes cleanly if a later action
    // re-reads it, and the broadcast stays valid for the UDF
    words.unpersist(blocking = false)
    out
  }

  /** Pinned 1e9-grid log-probs from the ×10-grid masses — the one
    * transcendental of the EM, absorbed by the grid (the q32 sigmoid
    * convention); probabilities are the exact rational m10/t10. */
  private def logp9(mass10: Map[String, Long], total10: Long): Map[String, Long] =
    mass10.map { case (p, m) =>
      val v = math.log(m.toDouble / total10) * 1e9
      p -> (if (v >= 0) math.round(v) else -math.round(-v))
    }

  /** Shared EM core: returns the persisted distinct-word frame, the
    * final inventory MASSES on the ×10 integer grid (the ε = 0.1
    * single-char floor is exactly +1 on that grid — the previous
    * double-mass formulation summed a map-iteration-ordered float
    * total, a latent partitioning sensitivity), the exact grid total,
    * and the last E-step counts. */
  private def fit(df: DataFrame, textCol: String, vocabSize: Int,
                  maxPieceLen: Int, rounds: Int)
      : (DataFrame, Map[String, Long], Long, Map[String, Long]) = {
    require(vocabSize >= 16 && maxPieceLen >= 2 && rounds >= 1,
      s"bad params: $vocabSize, $maxPieceLen, $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subsUdf = udf((w: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          out += w.substring(i, i + l); l += 1
        }
        i += 1
      }
      out.toSeq
    })
    val seedFreq = words
      .select(explode(subsUdf(col("w"))).as("piece"), col("wc"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("f"))
    val top = seedFreq.orderBy(col("f").desc, col("piece")).limit(vocabSize)
      .select(col("piece"), col("f")).as[(String, Long)].collect()
    val chars = seedFreq.where(length(col("piece")) === 1)
      .select(col("piece"), col("f")).as[(String, Long)].collect()
    // ×10-grid seed masses: prob = f/total and (10f)/(10·total) are the
    // same rational, so the seeded log-probs are unchanged
    var mass10: Map[String, Long] = (top ++ chars).toMap
      .map { case (p, f) => p -> f * 10L }
    var total10: Long = mass10.values.sum
    var counts: Map[String, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(logp9(mass10, total10))
      val viterbi: UserDefinedFunction =
        udf((w: String) => viterbiPieces(w, bc.value, maxPieceLen))
      val newCounts = words
        .select(explode(viterbi(col("w"))).as("piece"), col("wc"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("c"))
        .as[(String, Long)].collect().toMap
      counts = newCounts
      // M-step with a single-char ε floor (= +1 on the grid): characters
      // can never leave the inventory, so every word stays segmentable
      mass10 = mass10.keys.map { p =>
        p -> (newCounts.getOrElse(p, 0L) * 10L +
          (if (p.length == 1) 1L else 0L))
      }.filter(_._2 > 0).toMap
      total10 = mass10.values.sum
      bc.destroy()
    }
    (words, mass10, total10, counts)
  }

  /** The Viterbi-best segmentation of one word under PINNED 1e9-grid
    * piece log-probs — the dp is exact integer arithmetic: dp over end
    * positions, ties resolve toward the SMALLEST split point (longest
    * final piece) via strict-improvement ascending scan. Returns empty
    * when the word is unsegmentable under the inventory (cannot happen
    * after [[fit]]'s single-char ε floor). */
  private def viterbiPieces(w: String, lp9: Map[String, Long],
                            maxPieceLen: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = w.substring(j, i)
        lp9.get(piece).foreach { p =>
          if (best(j) != Long.MinValue && best(j) + p > best(i)) {
            best(i) = best(j) + p; back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (back(n) < 0 && n > 0) Seq.empty[String]
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var k = n
      while (k > 0) { out += w.substring(back(k), k); k = back(k) }
      out.reverse.toSeq
    }
  }
}
