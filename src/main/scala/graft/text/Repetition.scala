package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition / boilerplate quality filters (the Gopher-rules family,
  * Rae et al. 2021 §A1.1): per-document token-diversity and top-n-gram
  * mass statistics used to drop machine-generated and template text from
  * training corpora.
  *
  * Scale shape: a PURE PROJECTION. The obvious formulation explodes the
  * corpus into (doc, token) rows and double-aggregates — shuffling every
  * token of 100 TB twice to answer a per-document question. Here each
  * document's stats fold inside the row with higher-order array functions
  * (`array_sort` + `aggregate`: max run in sorted order IS the top item
  * count, run starts count the distincts), so the operator is
  * embarrassingly parallel, scan-bound, and stays inside whole-stage
  * codegen. O(n log n) per document, zero shuffles.
  *
  * Reference behavior: the reference filters rows on simple text
  * predicates before mining (process_logs_v10.py:100-117); these are the
  * corpus-curation grade of the same gate.
  */
object Repetition {

  private def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Fold a SORTED array into (top item count, distinct count). */
  private def topAndDistinct(sorted: Column): Column = {
    val init = struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit(0L).as("nd"))
    val folded = aggregate(sorted, init, (s, x) => {
      val same = s.getField("prev").isNotNull && (x === s.getField("prev"))
      val run = when(same, s.getField("run") + 1).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(s.getField("best"), run).as("best"),
        (s.getField("nd") + when(same, lit(0L)).otherwise(lit(1L))).as("nd"))
    })
    struct(folded.getField("best").as("top"), folded.getField("nd").as("nd"))
  }

  private def bigrams(t: Column): Column =
    transform(sequence(lit(1), size(t) - 1),
      i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))

  /** Per-document repetition stats:
    * `n_tokens`, `distinct_frac` (type-token ratio), `top_token_frac`
    * (mass of the most frequent token), `top_bigram_frac` (mass of the
    * most frequent 2-gram; null for docs of < 2 tokens) — each rounded
    * to 4 dp (double division of exact ints: deterministic IEEE). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val uni = topAndDistinct(array_sort(t))
    val bi = topAndDistinct(array_sort(bigrams(t)))
    val n = size(t).cast("long")
    df.select(
      col(idCol),
      n.as("n_tokens"),
      round(uni.getField("nd").cast("double") / n, 4).as("distinct_frac"),
      round(uni.getField("top").cast("double") / n, 4).as("top_token_frac"),
      when(n >= 2,
        round(bi.getField("top").cast("double") / (n - 1), 4)).as("top_bigram_frac"))
  }

  /** The filter form: keep documents under both repetition ceilings.
    * Thresholds follow the Gopher defaults' shape (most-common-word mass,
    * top-2-gram mass). */
  def filterRepetitive(df: DataFrame, idCol: String, textCol: String,
                       maxTopTokenFrac: Double = 0.2,
                       maxTopBigramFrac: Double = 0.1): DataFrame = {
    val stats = tokenStats(df, idCol, textCol)
    df.join(stats.filter(
        col("top_token_frac") <= maxTopTokenFrac &&
          coalesce(col("top_bigram_frac"), lit(0.0)) <= maxTopBigramFrac)
      .select(col(idCol)), Seq(idCol))
  }
}
