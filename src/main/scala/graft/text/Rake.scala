package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010) at corpus level: candidate
  * phrases are maximal stopword-free token runs; each word scores
  * `deg(w)/freq(w)` over all candidate phrases (deg = summed length of
  * phrases containing it — co-occurrence-weighted), a phrase scores the
  * sum of its word scores. The unsupervised keyword/keyphrase miner next
  * to [[TfIdf]] (which needs a document axis) and [[Cooccurrence]]'s PMI
  * (which stops at pairs) — corpus-level topical vocabulary for data
  * cards and mixture design.
  *
  * Scale shape: phrase assembly is the gaps-and-islands pattern INSIDE
  * each document — a per-document window (positions already carried by
  * `posexplode`, partitions are documents, WindowExec spills) followed by
  * a phrase-sized `collect_list` group; word and phrase statistics are
  * vocabulary-bounded aggregates; the final ranking is a distributed
  * top-k. No corpus-sized state anywhere beyond the token stream itself.
  *
  * Determinism: deg and freq are exact integers; each word score is one
  * double division pinned to a 9-dp long; phrase scores are exact sums of
  * those longs; ranking ties break on the phrase string. */
object Rake {

  /** Top-`k` phrases: `(phrase, n_occur, score)` — phrases capped at
    * `maxLen` tokens (longer runs are split by the cap is NOT done; runs
    * longer than `maxLen` are dropped as boilerplate, the standard RAKE
    * hygiene), scored over the whole corpus. */
  def topPhrases(docs: DataFrame, idCol: String, textCol: String,
                 stopwords: Seq[String], maxLen: Int, k: Int): DataFrame = {
    require(maxLen >= 1 && k >= 1, s"need maxLen, k >= 1: $maxLen, $k")
    val toks = docs.select(col(idCol).as("id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("stop", col("tok").isin(stopwords: _*) || col("tok") === "")
    // islands: consecutive non-stopword tokens share (pos − rank) inside
    // their document
    val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val runs = toks
      .withColumn("nsrank",
        sum(when(col("stop"), 0L).otherwise(1L)).over(wDoc))
      .filter(!col("stop"))
      .withColumn("isl", col("pos") - col("nsrank"))
    val phrases = runs.groupBy(col("id"), col("isl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("tok")))).as("ps"))
      .select(transform(col("ps"), p => p.getField("tok")).as("ws"))
      .filter(size(col("ws")) <= maxLen)
      .select(col("ws"), concat_ws(" ", col("ws")).as("phrase"))
    // word statistics over all candidate phrases: freq = occurrences,
    // deg = Σ length of containing phrases (deg ≥ freq, equality for
    // words only ever alone)
    val wordStats = phrases
      .select(explode(col("ws")).as("w"), size(col("ws")).as("len"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .select(col("w"),
        round(col("deg").cast("double") / col("freq") * lit(1e9))
          .cast("long").as("ws9"))
    val scored = phrases
      .select(col("phrase"), explode(col("ws")).as("w"))
      .join(wordStats, "w")
      .groupBy(col("phrase"))
      // each occurrence contributes its full word-score sum; dividing by
      // the occurrence count scores the phrase TYPE, counting it reports
      // support
      .agg((count(lit(1)) / size(split(col("phrase"), " "))).cast("long")
          .as("n_occur"),
        sum(col("ws9")).as("s9"))
      .select(col("phrase"), col("n_occur"),
        round(col("s9").cast("double") / col("n_occur") / 1e9, 6).as("score"))
    scored.orderBy(col("score").desc, col("phrase")).limit(k)
  }
}
