package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability scoring — the classic Flesch reading-ease formula over
  * whitespace words, vowel-group syllable estimates and terminal-punct
  * sentence counts. A standard text-quality curation signal next to the
  * length/stopword heuristics of [[TextAnalysis.qualityScore]] and the
  * C4/Gopher filters ([[HeuristicFilters]]).
  *
  * All three counts are `regexp_count`/`split` projections (codegen'd, no
  * UDF); the formula is a handful of double ops applied to identical
  * integer inputs in every engine, rounded at 4 dp. The syllable counter
  * is the standard vowel-RUN estimate (each maximal `[aeiouy]+` group ≈
  * one syllable) — deliberately simple, deterministic and documented
  * rather than a dictionary lookup.
  *
  * Scale shape: stateless per-row projection; nothing shuffles until the
  * caller aggregates. At 100 TB this rides the document scan for free.
  */
object Readability {

  /** Whitespace word count (≥1-char tokens of trimmed text). */
  def words(text: Column): Column = TextAnalysis.wsTokenCount(text)

  /** Vowel-run syllable estimate, floored at 1 per word so the
    * syllables-per-word ratio stays ≥ 1 on vowel-free text. */
  def syllables(text: Column): Column =
    greatest(regexp_count(lower(text), lit("[aeiouy]+")), words(text))

  /** Sentence count: runs of terminal punctuation, floored at 1. */
  def sentences(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1))

  /** Flesch reading ease, 4 dp:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`. */
  def fleschEase(text: Column): Column = {
    val wd = words(text).cast("double")
    val sy = syllables(text).cast("double")
    val st = sentences(text).cast("double")
    round(
      lit(206.835) - lit(1.015) * (wd / st) - lit(84.6) * (sy / wd), 4)
  }

  /** Per-document readability frame: counts, score, and a coarse band
    * (thresholds on the ROUNDED score, so band edges are portable). */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
        col(idCol),
        words(t).cast("long").as("n_words"),
        syllables(t).cast("long").as("n_syllables"),
        sentences(t).cast("long").as("n_sentences"),
        fleschEase(t).as("flesch"))
      .withColumn("band",
        when(col("flesch") >= 60, "easy")
          .when(col("flesch") >= 30, "medium")
          .otherwise("hard"))
  }
}
