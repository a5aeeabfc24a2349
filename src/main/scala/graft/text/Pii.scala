package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora: count and mask
  * email addresses, phone numbers, and IPv4 literals before export —
  * the privacy gate every pre-training pipeline runs (e.g. the BigCode
  * / StarCoder pipeline's PII redaction pass).
  *
  * Scale shape: a PURE PROJECTION — `regexp_count` / `regexp_replace`
  * are codegen'd, run per-row, and shuffle nothing. At 100 TB the pass
  * is scan-bound, exactly like the quality filters it pipelines with.
  * Patterns deliberately stay inside the RE2-compatible subset (no
  * backreferences, no lookaround) so any engine — and the DuckDB
  * oracle — computes the identical redaction.
  *
  * Reference behavior: the reference masks dynamic tokens out of log
  * lines with substitution regexes before mining
  * (process_logs_v10.py:70-88, IP/path/hex masks). This is the same
  * operator re-aimed at corpus privacy instead of template stability.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** TPC-H-style international phone: CC-NNN-NNN-NNNN. */
  val PhonePattern = "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact all three PII classes with typed placeholders. Email runs
    * first (its local part may contain digits/dots that the other
    * patterns could then split). */
  def scrub(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "[EMAIL]")
    val p = regexp_replace(e, PhonePattern, "[PHONE]")
    regexp_replace(p, Ipv4Pattern, "[IP]")
  }

  /** Per-row PII stats + redacted text: `n_email`, `n_phone`, `n_ip`,
    * `scrubbed`. Counts follow [[scrub]]'s precedence — each class is
    * counted on the text AFTER the earlier classes were masked, so the
    * counts reconcile 1:1 with the placeholders in `scrubbed` (an IP
    * that was really an email's host part counts as email, not both). */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "[EMAIL]")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "[PHONE]")
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_email"),
      regexp_count(afterEmail, lit(PhonePattern)).cast("long").as("n_phone"),
      regexp_count(afterPhone, lit(Ipv4Pattern)).cast("long").as("n_ip"),
      regexp_replace(afterPhone, Ipv4Pattern, "[IP]").as("scrubbed"))
  }
}
