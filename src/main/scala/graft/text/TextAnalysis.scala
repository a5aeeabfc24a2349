package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, canonical fingerprinting, language ID.
  *
  * Everything except [[LangId]] is pure `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage-friendly, no UDF in the hot path) and therefore
  * also expressible as oracle SQL. All operators are per-row projections —
  * embarrassingly parallel, no shuffle, scan-bound at 100 TB.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: alpha runs, single digits, single punctuation —
    * the shape of a byte-pair tokenizer's pre-tokenization split. */
  val BpeIshPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeIshTokenCount(text: Column): Column = regexp_count(text, lit(BpeIshPattern))

  /** Canonical content fingerprint: md5 over the sorted distinct token set.
    * Two documents with the same vocabulary (any order/multiplicity) share
    * a fingerprint — the blocking key for exact set-level dedup. */
  def setFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Quality score in [0,1]: average of
    *  - length credit   (tokens capped at 50),
    *  - punctuation sanity (1 - punct chars / chars),
    *  - stopword presence (stopword tokens / tokens).
    * Deterministic double arithmetic, rounded to 4 so any engine computing
    * the same formula hashes identically. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val punct = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double")
    val stopHits = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    val wordScore = least(nTok, lit(50.0)) / 50.0
    val punctScore = lit(1.0) - punct / greatest(nChars, lit(1.0))
    val stopScore = stopHits / greatest(nTok, lit(1.0))
    round((wordScore + punctScore + stopScore) / 3.0, 4)
  }
}
