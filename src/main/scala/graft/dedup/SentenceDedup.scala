package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sentence-level exact dedup: split documents into sentences, keep the
  * FIRST occurrence of every distinct sentence corpus-wide (first in the
  * total `(doc_id, position)` order), drop repeats — the sub-document
  * dedup pass (C4 §2.2 dedups at the three-sentence span level, CCNet at
  * the paragraph level) that removes boilerplate sentences repeated
  * across thousands of pages where document-level dedup sees only
  * distinct documents.
  *
  * Sentence segmentation is a deterministic regex split on terminal
  * punctuation runs followed by whitespace (`[.!?]+\s+`) — portable RE2
  * syntax any engine reproduces (no lookbehind), with the documented
  * artifact that a document-final sentence keeps its trailing
  * punctuation (no split fires without trailing whitespace). Good enough
  * for dedup keys; linguistic segmentation it is not.
  *
  * Scale shape: the keep-first decision groups on `md5(sentence)` — the
  * shuffle carries a 32-char digest + (doc_id, pos), never sentence
  * text, and the min-struct aggregate spills (no per-key array state).
  * Two shuffles total: the digest group and the per-doc rollup.
  */
object SentenceDedup {

  /** Trimmed, non-empty sentences of `textCol` (portable split — see
    * class doc). */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]+\\s+"), s => trim(s)),
      s => s =!= "")

  /** One row per (document, sentence position): `(idCol, pos, sentence,
    * keep)` where `keep = 1` iff this is the first occurrence of the
    * sentence in the global `(idCol, pos)` order. */
  def markSentences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), sentences(col(textCol)).as("__s"))
      .select(col(idCol), posexplode(col("__s")))
      .toDF(idCol, "pos", "sentence")
    // first occurrence via a min-struct window on the digest: one hash
    // shuffle, no join back, WindowExec spills on hot sentences
    val w = Window.partitionBy(md5(col("sentence")))
    exploded
      .withColumn("__first", min(struct(col(idCol), col("pos"))).over(w))
      .withColumn("keep",
        (col(s"__first.$idCol") === col(idCol) &&
          col("__first.pos") === col("pos")).cast("long"))
      .drop("__first")
  }

  /** Per-document dedup stats: `(idCol, n_sentences, n_kept, dup_frac)` —
    * every input document appears (documents with no sentences report
    * zeros and a null fraction). */
  def sentenceStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rolled = markSentences(df, idCol, textCol)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sentences"), sum(col("keep")).as("n_kept"))
    df.select(col(idCol))
      .join(rolled, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        when(coalesce(col("n_sentences"), lit(0L)) > 0,
          round((col("n_sentences") - col("n_kept")).cast("double") /
            col("n_sentences"), 4)).as("dup_frac"))
  }

  /** The apply form: documents re-assembled from their kept sentences
    * only (space-joined, original sentence order). Documents whose every
    * sentence was seen earlier come back empty — the caller's length
    * floor drops them. */
  def dedupSentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    markSentences(df, idCol, textCol)
      .filter(col("keep") === 1L)
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("sentence")))),
          p => p.getField("sentence"))).as("text_dedup"))
}
