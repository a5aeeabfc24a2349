package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chunk-level exact duplication: find spans of text repeated ACROSS
  * documents and score each document by how much of it is duplicated
  * elsewhere — the line/paragraph-level exact dedup of RefinedWeb
  * (Penedo et al. 2022 §3.3) and Falcon, adapted to unsegmented text by
  * chunking into fixed-width consecutive token windows. Document-level
  * dedup (q18/q43) misses the boilerplate case — a license header or
  * navigation block pasted into millions of otherwise-unique pages;
  * chunk-level catches exactly that.
  *
  * Scale shape, in order:
  *  1. Chunking is a zero-shuffle higher-order-function projection
  *     (`sequence` + `transform` + `slice`) — no explode-then-groupBy
  *     re-assembly of the corpus, stays in whole-stage codegen.
  *  2. Chunks are md5'd IN the same projection, so everything past the
  *     scan moves 16-byte digests, never text. At 100 TB the shuffled
  *     bytes are ~1% of the corpus.
  *  3. Cross-doc duplicated digests are found with one hash-keyed
  *     aggregate (uniform md5 keys — no skew), marked back onto the
  *     chunk table with a digest-keyed shuffle join (the duplicated-hash
  *     set is corpus-sized in the worst case, so no broadcast), and
  *     rolled up per document. Three shuffles total, all on digests/ids.
  *
  * Reference behavior: the reference dedups nothing (its corpus is one
  * machine's logs); this is the corpus-curation-grade operator the same
  * pipeline needs at training scale.
  */
object ChunkDedup {

  /** Consecutive `w`-token chunks of `text` (last chunk may be short),
    * as a zero-shuffle projection. */
  def chunks(text: Column, w: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    transform(
      sequence(lit(0), ((size(toks) - lit(1)) / w).cast("int")),
      i => array_join(slice(toks, i * w + 1, lit(w)), " "))
  }

  /** Per-document chunk-duplication stats: `n_chunks`, `dup_chunks`
    * (chunks whose content appears in at least one OTHER document),
    * `dup_frac`, and `keep` (1 iff `dup_frac < maxDupFrac`). */
  def docDupStats(df: DataFrame, idCol: String, textCol: String,
                  w: Int, maxDupFrac: Double): DataFrame =
    docDupStatsOfChunkHashes(
      df.select(col(idCol), explode(chunks(col(textCol), w)).as("chunk"))
        .select(col(idCol), md5(col("chunk")).as("h")),
      idCol, "h", maxDupFrac)

  /** [[docDupStats]] over PRE-COMPUTED exploded `(id, chunk-digest)` rows
    * — the entry point for pipelines that stage every per-document signal
    * off one corpus scan (q77's shape): the caller chunks + digests in
    * its own staged projection and this rollup never touches text. */
  def docDupStatsOfChunkHashes(ch: DataFrame, idCol: String, hashCol: String,
                               maxDupFrac: Double): DataFrame = {
    val chn = ch.select(col(idCol), col(hashCol).as("h"))
    // digests seen in >= 2 distinct documents
    val dup = chn.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("h"), lit(1L).as("is_dup"))
    chn.join(dup, Seq("h"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(coalesce(col("is_dup"), lit(0L))).as("dup_chunks"))
      .withColumn("dup_frac",
        round(col("dup_chunks").cast("double") / col("n_chunks"), 4))
      .withColumn("keep",
        (col("dup_frac") < maxDupFrac).cast("long"))
  }

  /** The apply form: drop documents whose duplicated-chunk mass reaches
    * `maxDupFrac`. */
  def filterDuplicated(df: DataFrame, idCol: String, textCol: String,
                       w: Int = 8, maxDupFrac: Double = 0.3): DataFrame =
    df.join(
      docDupStats(df, idCol, textCol, w, maxDupFrac)
        .filter(col("keep") === 1L).select(col(idCol)),
      Seq(idCol))
}
