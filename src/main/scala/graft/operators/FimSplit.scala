package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle training split (Bavarian et al. 2022): cut each
  * document at two hash-deterministic character positions into
  * (prefix, middle, suffix) and re-assemble in PSM order
  * `prefix ⊕ <FIM> ⊕ suffix ⊕ <MID> ⊕ middle` — the data-prep step
  * behind infilling-capable code/text models, sitting between the
  * chunkers ([[graft.text.Chunker]]) and the sequence packer
  * ([[Packing]]).
  *
  * Determinism contract: both cut points are md5-hash functions of the
  * document id ([[Sharding.hash32]] — any engine, any retry, same
  * split), sorted so `lo ≤ hi`; splitting is 1-based `substring`
  * arithmetic. Restricted to PRINTABLE-ASCII documents by predicate:
  * character-position semantics across engines diverge exactly on
  * combining sequences (code points vs grapheme clusters), so the
  * operator pins the domain where every engine agrees — the multi-byte
  * path belongs to a byte-offset variant, not silent disagreement.
  *
  * Scale: one projection — embarrassingly parallel, scan-bound. */
object FimSplit {

  /** One row per ASCII document: `(id, n_chars, pre_len, mid_len,
    * suf_len, psm_md5)` where `psm_md5` fingerprints the re-assembled
    * PSM string (proof the three spans are lossless and ordered). */
  def psm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ascii = docs.filter(col(textCol).rlike("^[ -~]*$"))
      .select(col(idCol).as("id"), col(textCol).as("t"),
        length(col(textCol)).cast("long").as("n_chars"))
    // two independent cuts in [0, L], sorted; % is safe: L ≥ 0 and
    // hash32 is non-negative
    val c1 = Sharding.hash32(concat(col("id").cast("string"), lit(":a"))) %
      (col("n_chars") + 1)
    val c2 = Sharding.hash32(concat(col("id").cast("string"), lit(":b"))) %
      (col("n_chars") + 1)
    ascii
      .withColumn("lo", least(c1, c2))
      .withColumn("hi", greatest(c1, c2))
      .select(col("id"), col("n_chars"),
        col("lo").as("pre_len"),
        (col("hi") - col("lo")).as("mid_len"),
        (col("n_chars") - col("hi")).as("suf_len"),
        md5(concat(
          col("t").substr(lit(1), col("lo")),
          lit("<FIM>"),
          col("t").substr(col("hi") + 1, col("n_chars") - col("hi")),
          lit("<MID>"),
          col("t").substr(col("lo") + 1, col("hi") - col("lo"))))
          .as("psm_md5"))
      .orderBy(col("id"))
  }
}
