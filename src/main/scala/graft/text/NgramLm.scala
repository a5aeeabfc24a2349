package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language-model scoring — the CCNet-style
  * (Wenzek et al. 2020) perplexity-proxy quality signal: documents whose
  * character statistics diverge from the corpus (or from a clean held-out
  * corpus) score low and are filtered or bucketed before training.
  *
  * The model is the corpus itself: `P(c | ab) = count(abc) / count(ab·)`
  * over all character trigrams, and a document's score is the MEAN
  * conditional trigram probability (not the log-product: avoiding
  * transcendentals keeps every arithmetic step — counts, one IEEE
  * division per distinct trigram, DECIMAL-exact summation — bit-equal
  * across engines, so the operator is SQL-oracle-able; the ranking it
  * induces is the same "how typical is this text" signal).
  *
  * Scale shape: two corpus passes, both shuffle-light —
  *  1. TRAIN: explode positions → trigram hash-aggregate (map-side
  *     partials over a bounded key space: |charset|³ keys at most);
  *     the prefix totals reuse the trigram table (a second tiny
  *     aggregate over model rows, not a corpus re-scan).
  *  2. SCORE: explode positions → broadcast-join the model (the model
  *     is bounded, AQE broadcasts it) → per-document DECIMAL mean.
  */
object NgramLm {

  /** Lowercased text with whitespace runs collapsed to single spaces —
    * the canonical character stream (mirrors `regexp_replace(lower(),
    * '\s+', ' ')` in SQL). */
  private def canon(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** `(doc, trigram)` position rows of the canonical stream. */
  private def triGrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = canon(col(textCol))
    df.select(col(idCol), t.as("__t"))
      .filter(length(col("__t")) >= 3)
      .select(col(idCol),
        explode(transform(sequence(lit(1), length(col("__t")) - 2),
          i => col("__t").substr(i, lit(3)))).as("tri"))
  }

  /** The trained model: `(tri, n_tri, n_prefix)` — trigram count and its
    * 2-char-prefix total (`count(ab·)`). */
  def train(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tris = triGrams(df, idCol, textCol)
      .groupBy(col("tri")).agg(count(lit(1)).as("n_tri"))
    val prefixes = tris
      .groupBy(substring(col("tri"), 1, 2).as("pre"))
      .agg(sum(col("n_tri")).as("n_prefix"))
    tris.join(prefixes, substring(col("tri"), 1, 2) === col("pre"))
      .select(col("tri"), col("n_tri"), col("n_prefix"))
  }

  /** Per-document mean conditional trigram probability under the corpus
    * model, rounded to 6 dp (DECIMAL-exact sum → one double division).
    * Documents shorter than 3 canonical chars score null. */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val model = train(df, textCol, idCol)
    val scored = triGrams(df, idCol, textCol)
      .join(model, "tri")
      .withColumn("p", col("n_tri").cast("double") / col("n_prefix").cast("double"))
    val agg = scored.groupBy(col(idCol))
      .agg(round(sum(col("p").cast("decimal(30,12)")).cast("double") /
        count(lit(1)), 6).as("lm_score"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
  }
}
