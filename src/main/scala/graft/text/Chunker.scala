package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking — the retrieval/embedding prep step that
  * splits long documents into fixed-size overlapping windows (context
  * windows for embedding models, RAG passages, long-doc training
  * samples). Complements [[graft.dedup.ChunkDedup]] (which chunks on
  * LINE boundaries for dedup) with position-based windows and overlap.
  *
  * Zero-shuffle: tokenization, window enumeration and slicing are one
  * projection (the token array is STAGED as a materialized attribute
  * first — higher-order functions re-evaluate nested expressions per
  * element, so an inline split would re-tokenize once per window). Row
  * growth is the inherent ~n/step multiplier of overlapped windows.
  */
object Chunker {

  /** Explode each document into windows of `winSize` tokens advancing by
    * `winSize - overlap`: window i covers tokens `[i·step, i·step +
    * winSize)`, the last window may be shorter, and a document of ≤
    * `winSize` tokens yields exactly one window. Returns
    * `(id, chunk_idx, n_chunk_tokens, chunk)`. */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   winSize: Int, overlap: Int): DataFrame = {
    require(winSize > 0 && overlap >= 0 && overlap < winSize,
      s"need 0 <= overlap < winSize, got winSize=$winSize overlap=$overlap")
    val step = winSize - overlap
    // the ONE corpus tokenizer (chunk boundaries must agree with the token
    // counts/fingerprints computed everywhere else)
    val staged = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val n = size(col("toks"))
    val nChunks = when(n <= winSize, lit(1))
      .otherwise(ceil((n - winSize).cast("double") / step).cast("int") + 1)
    staged
      .filter(n >= 1)
      .select(col("id"), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * step + 1, lit(winSize)).as("__w"))
      .select(col("id"), col("chunk_idx"),
        size(col("__w")).as("n_chunk_tokens"),
        concat_ws(" ", col("__w")).as("chunk"))
  }
}
