package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured log-line source + preprocessing projections.
  *
  * The reference treats a log corpus as a stream of raw strings and cleans
  * each line with a fixed regex chain before template mining
  * (`process_logs_v10.py:48-57`); it also documents (but never parses) the
  * implicit line grammar `ts level [thread] logger: message`
  * (`hadoop_logs.txt:1`). Here both surfaces are first-class:
  *
  *  - [[structure]] destructures lines into a typed schema with
  *    `regexp_extract` (continuation lines keep null ts/level/thread/logger
  *    but are RETAINED — SURVEY.md §1.3);
  *  - [[clean]] is the P1-P4 projection chain;
  *  - [[mask]] is the P5 masking-extractor chain (regex → `<*>`).
  *
  * All of it is `org.apache.spark.sql.functions` only — codegen'd, constant-
  * folded, and safe inside whole-stage codegen; no UDFs in the hot path.
  */
object LogLines {

  /** `2015-10-17 15:37:56,547` — leading timestamp (P1, v10:50). */
  val TsPattern = "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3}"

  /** Log level token (P2, v10:52). */
  val LevelPattern = "\\b(INFO|ERROR|WARN|DEBUG|TRACE)\\b"

  /** `[thread]` tag (P3, v10:54). */
  val ThreadPattern = "\\[\\w+\\]"

  /** Grammar of a timestamped Hadoop log line (FIXTURES.md §1). */
  val LineGrammar =
    "^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3}) (INFO|WARN|ERROR|FATAL|DEBUG|TRACE) (\\[[^\\]]+\\]) ([^\\s:]+): (.*)$"

  /** Default masking rules: the reference's intended extractors
    * (`process_logs_v10.py:24-37`) — timestamp, level, appattempt id.
    * (In the reference these were assigned to a config field the library
    * ignores, so its effective run had none; they are exposed here as the
    * documented *intended* semantics, off by default in mining.)
    */
  val DefaultMaskRules: Seq[(String, String)] = Seq(
    ("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}(,\\d+)?", "<*>"),
    ("(INFO|WARN|ERROR|DEBUG)", "<*>"),
    ("appattempt_\\d+_\\d+_\\d+", "<*>"))

  /** P1-P4: strip timestamp, level and thread tags, collapse whitespace.
    * Mirrors `preprocess_log_line` (`process_logs_v10.py:48-57`). */
  def clean(line: Column): Column = {
    val noTs = regexp_replace(line, TsPattern, "")
    val noLevel = regexp_replace(noTs, LevelPattern, "")
    val noThread = regexp_replace(noLevel, ThreadPattern, "")
    trim(regexp_replace(noThread, "\\s+", " "))
  }

  /** P5: masking extractors — each matching span replaced by a wildcard. */
  def mask(line: Column, rules: Seq[(String, String)] = DefaultMaskRules): Column =
    rules.foldLeft(line) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Destructure raw lines into the typed LogLine schema. Continuation
    * lines (no leading timestamp) yield nulls for the structured fields and
    * keep the raw payload — the miner must still see them (SURVEY §1.3). */
  def structure(raw: DataFrame, rawCol: String = "value"): DataFrame = {
    val c = col(rawCol)
    def grp(i: Int): Column = {
      val g = regexp_extract(c, LineGrammar, i)
      when(g === "", lit(null)).otherwise(g)
    }
    raw.select(
      to_timestamp(regexp_replace(grp(1), ",", "."), "yyyy-MM-dd HH:mm:ss.SSS").as("ts"),
      grp(2).as("level"),
      regexp_replace(grp(3), "[\\[\\]]", "").as("thread"),
      grp(4).as("logger"),
      coalesce(grp(5), c).as("message"),
      c.as("raw"))
  }
}
