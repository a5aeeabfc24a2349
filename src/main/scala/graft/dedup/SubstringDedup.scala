package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document SUBSTRING duplication — the span-level signal behind
  * suffix-array dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): document-level dedup (exact q18,
  * near-dup q59/q24) misses long boilerplate spans embedded in otherwise
  * distinct documents; this measures them.
  *
  * Method: fixed-length TOKEN windows (`window` tokens) fingerprinted
  * with md5, anchored at CONTENT-DEFINED positions — a window starts at
  * token i only when `md5(token_i) mod anchorMod == 0` (Manber 1994
  * mod-p fingerprint selection, the winnowing family). Because the
  * anchor decision depends on the token's content, not its offset, two
  * documents sharing a span select the SAME windows inside it whatever
  * the span's alignment — the property fixed-stride sampling lacks.
  * Expected anchor gap is `anchorMod` tokens, so a duplicated span of
  * `window + g` tokens is missed with probability
  * `(1 − 1/anchorMod)^(g+1)` (≈0.1% at g = 24, anchorMod = 4) — and
  * identically missed in every document, never inconsistently. Exact
  * suffix arrays are a sequential construction that buys little at
  * corpus scale over this one-scan approximation.
  *
  * Scale shape: anchoring + fingerprinting happen INSIDE the row (one
  * codegen'd projection over the token array; text never leaves the
  * scan stage) and only (16-byte fingerprint, doc, source) rows
  * shuffle; the duplicated-fingerprint set is a digest-keyed aggregate
  * re-joined by fingerprint. Cost ≈ one md5 per token plus one per
  * selected window (~1/anchorMod per token).
  */
object SubstringDedup {

  /** Anchored-window fingerprints `(doc, src?, fp)` for a token window
    * of `window`, anchor density 1/`anchorMod`. */
  private def windowFrame(df: DataFrame, idCol: String,
                          srcCol: Option[String], textCol: String,
                          window: Int, anchorMod: Int): DataFrame = {
    val base = Seq(col(idCol).as("doc")) ++ srcCol.map(c => col(c).as("src"))
    val kept = Seq(col("doc")) ++ srcCol.map(_ => col("src"))
    df.select((base :+ graft.text.TextAnalysis.tokens(col(textCol))
        .as("__toks")): _*)
      .where(size(col("__toks")) >= window)
      .select((kept :+ explode(expr(
        // anchor: first md5 hex byte of the token ≡ 0 (mod anchorMod);
        // fingerprint: md5 of the space-joined window slice
        s"""filter(transform(sequence(1, size(__toks) - ${window - 1}),
           |  i -> IF(CAST(conv(substring(md5(element_at(__toks, i)), 1, 2), 16, 10) AS INT) % $anchorMod = 0,
           |          md5(array_join(slice(__toks, i, $window), ' ')),
           |          CAST(NULL AS STRING))),
           |x -> x IS NOT NULL)""".stripMargin)).as("fp")): _*)
  }

  /** Per-source duplicated-window report: `(source, n_docs, n_windows,
    * dup_windows, dup_ratio)` where a window is `dup` when its
    * fingerprint occurs in ≥ 2 DISTINCT documents (intra-doc repetition
    * is [[graft.text.Repetition]]'s business, not cross-doc
    * contamination). Docs with fewer than `window` tokens contribute no
    * windows but still count in `n_docs`. */
  def perSourceReport(df: DataFrame, idCol: String, sourceCol: String,
                      textCol: String, window: Int = 20,
                      anchorMod: Int = 4): DataFrame = {
    require(window >= 2 && anchorMod >= 1,
      s"bad window/anchorMod: $window/$anchorMod")
    // widen a narrow scan first: the anchor-fingerprint projection is
    // re-executed by all three consumers below, each otherwise pinned to
    // the single-row-group scan's 2-3 partitions
    val wide = graft.operators.Spread.widen(df, col(idCol))
    val w = windowFrame(wide, idCol, Some(sourceCol), textCol, window, anchorMod)
    val dupFp = w.groupBy(col("fp"))
      .agg(countDistinct(col("doc")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("fp"))
    val winPerSrc = w.groupBy(col("src")).agg(count(lit(1)).as("n_windows"))
    val dupPerSrc = w.join(dupFp, Seq("fp"), "left_semi")
      .groupBy(col("src")).agg(count(lit(1)).as("dup_windows"))
    df.groupBy(col(sourceCol).as("src")).agg(count(lit(1)).as("n_docs"))
      .join(winPerSrc, Seq("src"), "left_outer")
      .join(dupPerSrc, Seq("src"), "left_outer")
      .select(col("src").as("source"), col("n_docs"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          round(coalesce(col("dup_windows"), lit(0L)).cast("double") /
            col("n_windows"), 6)).as("dup_ratio"))
      .orderBy(col("source"))
  }

  /** MAXIMAL duplicated spans per document — the REMOVAL UNIT of
    * Lee et al. 2022's substring dedup ([[perSourceReport]] measures
    * the mass; this returns the actual `(doc, span_start, span_end)`
    * token ranges a removal pass would cut): every `window`-token
    * sliding window is fingerprinted EXACTLY (no anchor sampling — the
    * exact sibling of the anchored estimator, paying one md5 per token
    * position for exactness), windows whose fingerprint occurs in
    * ≥ `minDocs` distinct documents are kept, and per document the
    * overlapping/adjacent hit windows coalesce into maximal spans by
    * island detection (a new span starts when a hit's position exceeds
    * the previous hit's position + `window` — i.e. the two windows'
    * token ranges no longer touch). 1-based inclusive token positions.
    *
    * Scale shape: one `(fp, doc, pos)` shuffle of n·tokens rows (the
    * price of exactness over [[perSourceReport]]'s 1/anchorMod
    * sampling; fingerprints are 32-byte digests, text never leaves the
    * scan), a digest-keyed dup filter, then the island lag/sum windows
    * run per DOCUMENT — bounded by a document's own hit count, the
    * per-item window class (keyframes, chunking), never corpus-keyed. */
  /** Exact (unsampled) window fingerprints `(doc, pos, fp)`, checkpointed:
    * the frame is consumed by a dup-fingerprint rollup AND a position
    * join in every caller — materialize the n·tokens fan-out once (the
    * q249 discipline; the frame is digest+doc+pos, never text). */
  private def exactWins(df: DataFrame, idCol: String, textCol: String,
                        window: Int): DataFrame = {
    // fail at plan time on a non-integral id: the long cast below would
    // null every doc and countDistinct skips nulls, so the query would
    // silently return zero spans (the TopK.requireIntegralId contract)
    graft.functions.TopK.requireIntegralId(df, idCol, "SubstringDedup")
    val wide = graft.operators.Spread.widen(df, col(idCol))
    wide
      .select(col(idCol).cast("long").as("doc"),
        graft.text.TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= window)
      .select(col("doc"), explode(expr(
        s"""transform(sequence(1, size(__toks) - ${window - 1}),
           |  i -> struct(i AS pos,
           |              md5(array_join(slice(__toks, i, $window), ' ')) AS fp))"""
          .stripMargin)).as("w"))
      .select(col("doc"), col("w.pos").cast("long").as("pos"), col("w.fp").as("fp"))
      .localCheckpoint(true)
  }

  /** Coalesce hit window positions `(doc, pos)` into maximal spans
    * `(doc, span_start, span_end, n_windows)` — island detection under
    * per-DOC lag/sum windows (bounded by a document's own hit count). */
  private def islands(hits: DataFrame, window: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    hits
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + window, 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(byDoc))
      .groupBy(col("doc"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + window - 1).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc"), col("span_start"), col("span_end"), col("n_windows"))
  }

  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      window: Int, minDocs: Int = 2): DataFrame = {
    require(window >= 2 && minDocs >= 2, s"bad window/minDocs: $window/$minDocs")
    val wins = exactWins(df, idCol, textCol, window)
    val dupFp = wins.groupBy(col("fp"))
      .agg(countDistinct(col("doc")).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("fp"))
    val hits = wins.join(dupFp, Seq("fp"), "left_semi")
      .select(col("doc"), col("pos"))
    islands(hits, window)
      .select(col("doc").as("doc_id"), col("span_start"), col("span_end"),
        col("n_windows"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** APPLY the substring dedup — the Lee et al. 2022 removal pass: every
    * duplicated window is removed from every document EXCEPT the
    * fingerprint's canonical owner (the smallest sharing doc id — one
    * occurrence always survives, deterministically), removable windows
    * coalesce to maximal spans per doc, and the spans' tokens are cut.
    * Output `(doc_id, n_tokens, n_removed, cleaned_text)` — cleaned
    * text is whitespace-normalized (single-space re-join of the kept
    * tokens, the [[graft.text.TextAnalysis.tokens]] grid both engines
    * share).
    *
    * Scale shape: the fingerprint frame shuffles once ([[exactWins]],
    * checkpointed), ownership is a digest-keyed aggregate, span
    * coalescing and the token cut run under per-DOC windows/joins
    * (span lists are per-doc bounded), and the rebuild is one
    * group-by-doc fold — no corpus-keyed window anywhere. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            window: Int, minDocs: Int = 2): DataFrame = {
    require(window >= 2 && minDocs >= 2, s"bad window/minDocs: $window/$minDocs")
    val wins = exactWins(df, idCol, textCol, window)
    val own = wins.groupBy(col("fp"))
      .agg(min(col("doc")).as("owner"), countDistinct(col("doc")).as("nd"))
      .where(col("nd") >= minDocs)
    val removable = wins.join(own, "fp")
      .where(col("doc") =!= col("owner"))
      .select(col("doc"), col("pos"))
    val spans = islands(removable, window)
      .select(col("doc"), col("span_start"), col("span_end"))
    // coalesce NULL text to '' so a null-text doc still emits its one
    // ("") token row and stays present in `sizes` (n_tokens = 1), the
    // same row the SQL twin produces over coalesce(text, '') — without
    // this, tokens(null) is null, posexplode emits nothing, and the doc
    // silently vanishes from the output
    val toks = df.select(col(idCol).cast("long").as("doc"),
        graft.text.TextAnalysis.tokens(coalesce(col(textCol), lit("")))
          .as("__toks"))
      .select(col("doc"), posexplode(col("__toks")).as(Seq("p0", "tok")))
      .select(col("doc"), (col("p0") + 1).cast("long").as("tpos"), col("tok"))
    val kept = toks.join(spans,
      toks("doc") === spans("doc") &&
        col("tpos") >= col("span_start") && col("tpos") <= col("span_end"),
      "left_anti")
    // per-doc token totals off the SAME exploded frame (every doc has
    // ≥ 1 token row — split of "" is [""]) — not a third tokenize pass
    val sizes = toks.groupBy(col("doc")).agg(count(lit(1)).as("n_tokens"))
    val rebuilt = kept.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
          x => x.getField("tok")), " ").as("cleaned_text"))
    sizes.join(rebuilt, Seq("doc"), "left_outer")
      .select(col("doc").as("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .orderBy(col("doc_id"))
  }

  /** The most-duplicated windows themselves: `(fp, n_docs, n_occ)` top-k
    * by distinct-document reach — the "what IS this boilerplate"
    * drill-down (join back on the fingerprint to recover spans). */
  def topWindows(df: DataFrame, idCol: String, textCol: String,
                 window: Int, anchorMod: Int, k: Int): DataFrame = {
    val w = windowFrame(df, idCol, None, textCol, window, anchorMod)
    w.groupBy(col("fp"))
      .agg(countDistinct(col("doc")).as("n_docs"), count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), desc("n_occ"), col("fp"))
      .limit(k)
  }
}
