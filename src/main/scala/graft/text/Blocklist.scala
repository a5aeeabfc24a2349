package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-level phrase-blocklist filtering (the C4 "bad words" pass,
  * Raffel et al. 2020 §2.2: drop any page containing a phrase from a
  * fixed list): count blocklist phrase OCCURRENCES per document and flag
  * the documents any curation pass would drop.
  *
  * Matching is at token granularity — a phrase of `m` tokens matches a
  * document's m-gram exactly (no substring false-positives: "ass" does
  * not match "assistant"), which is the standard wordlist semantic.
  *
  * Scale shape: the blocklist is small by nature (hundreds to a few
  * thousand phrases) and BROADCAST; the corpus is scanned ONCE,
  * exploding only the n-gram lengths the blocklist actually contains
  * (a 1-and-2-token list never generates trigrams). The join output is
  * matched occurrences only; the per-doc rollup re-keys on the doc id.
  * The corpus never shuffles on text.
  */
object Blocklist {

  /** Per-document blocklist hits: `(idCol, n_hits, n_distinct_phrases,
    * blocked)` — occurrence count, distinct phrases seen, and the drop
    * flag (`n_hits > 0`). Every input document appears. `phrases` is a
    * one-column DataFrame of phrase strings; matching is on
    * whitespace-tokenized lowercased text ([[TextAnalysis.tokens]] on
    * both sides). */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
                 phrases: DataFrame): DataFrame = {
    val phraseCol = phrases.columns.head
    // normalize phrases through the same tokenizer as the corpus, keep
    // their token length so only needed n-gram sizes explode
    val plist = phrases
      .select(TextAnalysis.tokens(col(phraseCol)).as("__pt"))
      .filter(size(col("__pt")) > 0)
      .select(concat_ws(" ", col("__pt")).as("phrase"), size(col("__pt")).as("plen"))
      .distinct()
    val lens: Seq[Int] = plist.select(col("plen")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted // bounded: ≤ max phrase length
    graft.functions.ShingleList.register(docs.sparkSession)
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    // one scan: per doc, all n-grams of exactly the blocklist's lengths —
    // the native codegen shingle list (the declarative transform+slice
    // evaluated its lambda interpreted per position)
    def grams(n: Int): Column =
      if (n == 1) col("__toks")
      else call_function(graft.functions.ShingleList.Name, col("__toks"), lit(n))
    // all lengths ride ONE scan: the per-length gram arrays concatenate
    // before the explode (a per-length union would re-tokenize the
    // corpus once per distinct phrase length)
    val exploded =
      if (lens.isEmpty)
        toks.select(col(idCol), lit(null).cast("string").as("phrase")).limit(0)
      else toks.select(col(idCol),
        explode(concat(lens.map(grams): _*)).as("phrase"))
    val hits = exploded
      .join(broadcast(plist.select(col("phrase"))), Seq("phrase"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("phrase")).as("n_distinct_phrases"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_distinct_phrases"), lit(0L)).as("n_distinct_phrases"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("blocked"))
  }
}
