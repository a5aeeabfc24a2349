package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic document filters (Raffel et al. 2020, "Exploring
  * the Limits of Transfer Learning…", §2.2) — the rule family every
  * web-scale curation pipeline applies before model-based scoring:
  * terminal punctuation, sentence count, word-shape sanity, boilerplate
  * markers. The reference applies the same *grade* of gate (simple text
  * predicates before mining, `process_logs_v10.py:100-117`); these are
  * the corpus-curation versions.
  *
  * Scale shape: a PURE PROJECTION over codegen'd built-ins (regexp
  * counts, length arithmetic) — embarrassingly parallel, zero shuffles,
  * scan-bound at 100 TB, and therefore also expressible as oracle SQL.
  * [[compressionRatio]] is the one UDF (java.util.zip has no SQL form);
  * it is still per-row and allocation-bounded by the document length.
  */
object HeuristicFilters {

  /** Per-document C4-style stats:
    *  - `ends_terminal`  — document ends with `. ! ? "` (C4 keeps lines
    *    that end in terminal punctuation);
    *  - `n_sentences`    — terminal-punctuation runs;
    *  - `n_words`, `mean_word_len` — word-shape sanity (Gopher keeps
    *    mean word length in [3, 10]);
    *  - `alpha_frac`     — alphabetic characters / non-space characters
    *    (drops symbol/number dumps);
    *  - `has_brace`, `has_lorem` — code and placeholder boilerplate
    *    markers (C4 drops pages containing `{` or "lorem ipsum"). */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text behaves as empty (all stats defined, gates fail) — and
    // words are COUNTED as \S+ matches: a split on empty text yields [""]
    // (n_words = 1 for an empty document), the match count yields 0
    val t = coalesce(trim(col(textCol)), lit(""))
    val nWords = regexp_count(t, lit("\\S+")).cast("double")
    val nonSpace = regexp_count(t, lit("\\S")).cast("double")
    val alpha = regexp_count(t, lit("[A-Za-z]")).cast("double")
    df.select(
      col(idCol),
      t.rlike("[.!?\"]$").cast("int").as("ends_terminal"),
      regexp_count(t, lit("[.!?]+")).as("n_sentences"),
      nWords.cast("long").as("n_words"),
      // true mean word length: word (non-space) characters per word —
      // not alpha-only, which under-measured numeric/code-ish text
      round(nonSpace / greatest(nWords, lit(1.0)), 4).as("mean_word_len"),
      round(alpha / greatest(nonSpace, lit(1.0)), 4).as("alpha_frac"),
      t.contains("{").cast("int").as("has_brace"),
      lower(t).contains("lorem ipsum").cast("int").as("has_lorem"))
  }

  /** The filter form: keep documents passing every C4-ish gate. Returns
    * the input rows that survive (all original columns). */
  def filterC4(df: DataFrame, idCol: String, textCol: String,
               minSentences: Int = 1, minWords: Int = 5,
               minAlphaFrac: Double = 0.6): DataFrame = {
    val s = stats(df, idCol, textCol)
    df.join(
      s.filter(
        col("ends_terminal") === 1 &&
          col("n_sentences") >= minSentences &&
          col("n_words") >= minWords &&
          col("alpha_frac") >= minAlphaFrac &&
          col("has_brace") === 0 && col("has_lorem") === 0)
        .select(col(idCol)),
      idCol)
  }

  /** Deflate compression ratio `compressed_bytes / utf8_bytes` — a
    * language-free templated-text detector (highly compressible ⇒
    * machine-generated/repetitive; incompressible ⇒ random noise). The
    * standard cheap complement to the Gopher repetition rules. Level 6,
    * fixed strategy ⇒ deterministic across JVMs (zlib's output for a
    * given input/level is stable). No SQL form — spec-tested. */
  def compressionRatio(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(in); d.finish()
        val buf = new Array[Byte](in.length + 64)
        var out = 0
        while (!d.finished()) out += d.deflate(buf, out, buf.length - out)
        d.end()
        math.rint(out.toDouble / in.length * 10000) / 10000
      }
    }
    f(text)
  }
}
