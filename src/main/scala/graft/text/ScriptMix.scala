package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-class composition audit per language slice — the
  * script-level quality check next to [[graft.analyze]]'s mojibake
  * detector: a corpus whose "en" slice is 20% digits or has non-ASCII
  * bleed-through has an extraction problem upstream. Per document the
  * four class counts come from `length(regexp_replace(...))` deltas
  * (one regex pass per class, codegen'd, no explode); the per-slice
  * fractions divide EXACT corpus-level integer sums — no per-doc
  * double averaging anywhere.
  *
  * Output per language: `(lang, n_docs, n_chars, latin_frac,
  * digit_frac, space_frac, other_frac, nonascii_docs)` at 6 dp,
  * ordered by lang — `other` = punctuation + symbols + non-ASCII;
  * `nonascii_docs` counts documents with ANY byte outside ASCII. */
object ScriptMix {

  def scriptMix(df: DataFrame, langCol: Column, textCol: Column): DataFrame = {
    def cnt(pattern: String): Column =
      (length(textCol) - length(regexp_replace(textCol, pattern, "")))
        .cast("long")
    val per = df.select(langCol.as("lang"),
      length(textCol).cast("long").as("nc"),
      cnt("[A-Za-z]").as("latin"),
      cnt("[0-9]").as("digit"),
      cnt("\\s").as("space"),
      when(length(regexp_replace(textCol, "[^\\x00-\\x7F]", "")) <
        length(textCol), 1L).otherwise(0L).as("na"))
    per.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("latin")).as("sl"), sum(col("digit")).as("sd"),
        sum(col("space")).as("ss"), sum(col("na")).as("nonascii_docs"))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        round(col("sl").cast("double") / col("n_chars"), 6).as("latin_frac"),
        round(col("sd").cast("double") / col("n_chars"), 6).as("digit_frac"),
        round(col("ss").cast("double") / col("n_chars"), 6).as("space_frac"),
        round((col("n_chars") - col("sl") - col("sd") - col("ss"))
          .cast("double") / col("n_chars"), 6).as("other_frac"),
        col("nonascii_docs"))
      .orderBy(col("lang"))
  }
}
