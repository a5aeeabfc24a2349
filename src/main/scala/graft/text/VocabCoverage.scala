package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary coverage diagnostics for a training corpus:
  * out-of-vocabulary rate against a frequency-built vocab, and the
  * Heaps-law vocabulary growth curve over corpus prefixes — the two
  * readouts that size a tokenizer (is the vocab big enough? has the
  * corpus stopped yielding new types?) before a [[BpeTrainer]] run.
  *
  * Determinism: the vocab is the top `vocabSize` tokens under the TOTAL
  * order (count desc, token asc) — the boundary tie cannot differ across
  * engines; growth buckets come from integer arithmetic on the id column.
  *
  * Scale shape: one explode + token-keyed count (the same shuffle the
  * BPE/TF-IDF family already pays), a broadcast of the vocab (bounded by
  * `vocabSize`), and bucket-keyed rollups of ≤`buckets` rows. The growth
  * curve never builds per-prefix distinct sets — each token contributes
  * only its FIRST bucket (a min-aggregate), and the cumulative sum runs
  * over the `buckets`-row frame.
  */
object VocabCoverage {

  /** Per-`groupCol` token totals and OOV rate (6 dp) against the corpus
    * top-`vocabSize` vocabulary. */
  def oovReport(docs: DataFrame, groupCol: String, textCol: String,
                vocabSize: Int): DataFrame = {
    val tok = docs.select(col(groupCol).as("grp"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(1L).as("__in"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("grp").as(groupCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
      .orderBy(col(groupCol))
  }

  /** Heaps-law curve: `(bucket, new_tokens, vocab_size)` over `buckets`
    * equal id-range prefixes of the corpus (bucket = id·buckets div
    * (max_id+1)). Empty buckets appear with zero new types. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 10000, s"buckets out of range: $buckets")
    val mx = docs.agg(max(col(idCol)).as("mx"))
    val firsts = docs.crossJoin(broadcast(mx))
      .select(
        expr(s"($idCol * $buckets) div (mx + 1)").as("bucket"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(min(col("bucket")).as("first_bucket"))
      .groupBy(col("first_bucket")).agg(count(lit(1)).as("new_tokens"))
    val axis = mx.select(explode(sequence(lit(0L), lit(buckets - 1L))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    // single-partition window: the frame is the `buckets`-row axis, never
    // the corpus
    axis.join(firsts.withColumnRenamed("first_bucket", "bucket"), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("vocab_size", sum(col("new_tokens")).over(w))
      .orderBy(col("bucket"))
  }
}
