package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BPE merge-rule training over a corpus (Sennrich et al. 2016): learn
  * the `numMerges` most frequent adjacent-symbol merges, the standard
  * subword-tokenizer construction step of an LLM data pipeline (the
  * `bpeIshTokenCount` projection is the APPLY-side proxy; this is the
  * LEARN side).
  *
  * Scale split, mirroring the IVF-quantizer / isolation-forest pattern
  * (distributed statistics, bounded driver state):
  *  - the CORPUS-sized work — word counting — is one distributed
  *    hash aggregate (map-side partial on uniform word keys);
  *  - the merge loop runs on the collected word HISTOGRAM, which is
  *    bounded by `maxVocabWords` (top words by count; a heavy-tailed
  *    corpus concentrates nearly all pair mass there) — this is how
  *    production BPE trainers work too: no trainer iterates 100 TB,
  *    they iterate the word-count table.
  *
  * Deterministic end to end: word selection ties break by (count desc,
  * word), merge ties by (freq desc, pair lexicographic) — any engine
  * and any partitioning reproduces the identical merge table.
  */
object BpeTrainer {

  /** Learned merges: `(rank, left, right, freq)` — `rank` is merge
    * order (0-based), `freq` the pair frequency at merge time. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 50000): DataFrame = {
    require(numMerges > 0 && maxVocabWords > 0)
    val spark = df.sparkSession
    val words = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = trainOnHistogram(words, numMerges)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("rank", org.apache.spark.sql.types.LongType, nullable = false)
      .add("left", org.apache.spark.sql.types.StringType, nullable = false)
      .add("right", org.apache.spark.sql.types.StringType, nullable = false)
      .add("freq", org.apache.spark.sql.types.LongType, nullable = false)
    spark.createDataFrame(
      java.util.Arrays.asList(merges.zipWithIndex.map { case ((l, r, f), i) =>
        Row(i.toLong, l, r, f)
      }: _*), schema)
  }

  /** The in-memory merge loop over a word histogram — exposed for the
    * spec's brute-force comparison. Symbols start as single characters;
    * each round merges the globally most frequent adjacent pair
    * (ties: lexicographic) across all words, weighted by word count. */
  def trainOnHistogram(words: Seq[(String, Long)],
                       numMerges: Int): Seq[(String, String, Long)] = {
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    while (i < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (counts.isEmpty) i = numMerges
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, f))
        val merged = l + r
        seqs = seqs.map { case (syms, c) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              b += merged; j += 2
            } else { b += syms(j); j += 1 }
          }
          (b.toArray, c)
        }
        i += 1
      }
    }
    out.toSeq
  }
}
