package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE ENCODING — the apply side of [[BpeTrainer]] (Sennrich et al.
  * 2016): segment each word with the learned merge table and report the
  * real subword token count per document. `bpeIshTokenCount` is the
  * regex-shaped proxy; this is the faithful tokenizer a data pipeline
  * runs to budget context windows and measure fertility
  * (subwords / word) per source.
  *
  * Scale shape: the merge table is O(numMerges) — collected once,
  * broadcast, and applied by a per-row UDF (the merge loop is inherently
  * sequential per word; there is no built-in form). Encoding is a pure
  * projection: embarrassingly parallel, zero shuffles beyond the
  * trainer's own aggregate. Per-word results are memoized in a bounded
  * PER-EXECUTOR cache keyed by the broadcast merge table (Zipf: the hot
  * words dominate every partition), so the amortized cost per token is
  * near O(word length).
  */
object BpeEncoder {

  /** Per-executor encode memo, keyed by broadcast id so different merge
    * tables never mix; bounded BOTH ways so no workload can hold
    * executor heap for the life of the JVM: per-table entries cap at
    * [[MemoCap]] (past it, encode costs revert to O(len²) per word —
    * still correct), and at most [[MaxTables]] merge tables stay
    * memoized (training many tables in one long-lived session evicts
    * the older tables' memos; re-encoding under an evicted table just
    * re-warms). ConcurrentHashMap: local mode shares one closure across
    * task threads, and reads must stay lock-free — this is a per-row
    * path. */
  private val MemoCap = 1 << 17
  private val MaxTables = 4
  private val memos =
    new java.util.concurrent.ConcurrentHashMap[Long, java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]]()
  private[text] def memoFor(bcId: Long): java.util.concurrent.ConcurrentHashMap[String, java.lang.Long] = {
    // Eviction runs BEFORE computeIfAbsent, never inside its mapping
    // function: CHM's contract forbids the mapping function from
    // updating other mappings (two tasks concurrently inserting
    // different new ids while each removes a key in the other's bin is
    // an ABBA deadlock on the bin locks; same-bin removal mutates the
    // bin under the reservation lock). Outside the lambda the removals
    // are plain concurrent ops; the size check racing another thread's
    // insert can at worst briefly overshoot MaxTables by the number of
    // racing threads — a benign bound, not a correctness property.
    if (memos.size >= MaxTables && !memos.containsKey(bcId)) {
      val it = memos.keys()
      while (memos.size >= MaxTables && it.hasMoreElements) {
        val k = it.nextElement()
        if (k != bcId) memos.remove(k)
      }
    }
    memos.computeIfAbsent(bcId,
      _ => new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]())
  }

  /** Greedy lowest-rank-first BPE segmentation of one word (the standard
    * encode loop: repeatedly merge the adjacent pair with the smallest
    * merge rank until none applies). Exposed for the spec. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = syms(bestAt) + syms(bestAt + 1)
        syms = syms.patch(bestAt, Array(merged), 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Per-document subword stats under a trained merge table:
    * `(id, n_words, n_subwords, fertility)` — fertility = subwords/word,
    * the tokenizer-quality number (rounded to 4 dp). */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
                  merges: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val table = merges.select(col("rank").cast("int"), col("left"), col("right"))
      .collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getInt(0)))
      .toMap
    val ranksB = spark.sparkContext.broadcast(table)
    val bcId = ranksB.id
    val nSubUdf = udf { (toks: Seq[String]) =>
      if (toks == null) 0L
      else {
        // per-executor memo (bounded, keyed by the broadcast table):
        // hot Zipf words are encoded once per executor, not once per row
        val memo = BpeEncoder.memoFor(bcId)
        var n = 0L
        toks.foreach { w =>
          if (w.nonEmpty) {
            val cached = memo.get(w)
            if (cached != null) n += cached.longValue()
            else {
              val len = encodeWord(w, ranksB.value).length.toLong
              if (memo.size < BpeEncoder.MemoCap) memo.put(w, java.lang.Long.valueOf(len))
              n += len
            }
          }
        }
        n
      }
    }
    val toks = split(lower(trim(col(textCol))), "\\s+")
    df.select(col(idCol),
        size(filter(toks, w => length(w) > 0)).cast("long").as("n_words"),
        nSubUdf(toks).as("n_subwords"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_subwords").cast("double") / col("n_words"), 4)))
  }
}
