package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level distribution diagnostics for a training-data pipeline:
  * the duplicated n-gram mass of Lee et al., "Deduplicating Training Data
  * Makes Language Models Better" (the metric that motivates substring
  * dedup), and per-source token-distribution divergence (the mixture
  * drift check run before reweighting domains).
  *
  * Both are single aggregation pipelines with map-side partial combine —
  * the corpus is scanned once and only (group-key, count) rows shuffle.
  */
object CorpusStats {

  /** Per-document CHARACTER ENTROPY (Shannon, in bits): the
    * language-free quality signal complementing the token-level filters —
    * near-zero entropy flags repeated-character padding, very high
    * entropy flags base64/binary dumps; both are standard pre-training
    * drop rules.
    *
    * Scale shape: explode characters → two-phase (doc, char) hash
    * aggregate (map-side combine collapses within-partition repeats) →
    * per-doc rollup. H = log2(n) − Σc·log2(c)/n, with the log identity
    * keeping every term a log of an exact INTEGER count — both engines
    * evaluate log2 on identical integer inputs, so cross-engine noise is
    * confined to the final sum/division (rounded to 4 dp, the q54
    * precedent for transcendental outputs). */
  def docCharEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_chars"),
        round(log2(sum(col("c"))) -
          sum(col("c") * log2(col("c"))) / sum(col("c")), 4).as("entropy_bits"))

  /** Corpus duplicated word-n-gram statistics, one output row:
    * `(total_ngrams, distinct_ngrams, dup_ngrams, dup_occurrences,
    * dup_frac)` where a "dup" n-gram occurs ≥ 2 times corpus-wide
    * (within- or cross-document).
    *
    * Scale shape: explode shingles → two-phase hash aggregate on the
    * shingle (map-side combine collapses per-partition repeats, so the
    * shuffle carries per-partition distinct shingles, not occurrences) →
    * one global partial-merged rollup of the count histogram. Nothing is
    * collected; the widest shuffle key is one shingle string. */
  def dupNgramStats(df: DataFrame, textCol: String, n: Int): DataFrame = {
    graft.functions.ShingleList.register(df.sparkSession)
    // native codegen shingle LIST (duplicates kept — multiplicity is the
    // signal here); the declarative HOF evaluated interpreted per position
    val grams = df.select(TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(explode(call_function(graft.functions.ShingleList.Name,
        col("toks"), lit(n))).as("g"))
    val counted = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
    counted.agg(
      sum(col("c")).as("total_ngrams"),
      count(lit(1)).as("distinct_ngrams"),
      sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup_ngrams"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_occurrences"))
      .select(col("total_ngrams"), col("distinct_ngrams"), col("dup_ngrams"),
        col("dup_occurrences"),
        round(col("dup_occurrences").cast("double") / col("total_ngrams"), 4)
          .as("dup_frac"))
  }

  /** Per-source total-variation distance between the source's unigram
    * distribution and the whole-corpus distribution:
    * `TV(s) = ½ Σ_t |cnt_st/S − cnt_t/C|`.
    *
    * Computed in EXACT integer arithmetic — `Σ_t |cnt_st·C − cnt_t·S|`
    * over DECIMAL(38,0), one float division at the very end — so the
    * result is bit-identical at any partitioning and on any engine
    * (a float-term sum would inherit summation-order noise, the round-1
    * q44 failure class). Tokens absent from a source contribute
    * `(C − Σ_{t∈s} cnt_t)·S` in closed form, so only the inner
    * (source, token) join is ever materialized.
    *
    * Scale shape: (source, token) counts → token totals derived FROM that
    * aggregate (never a second corpus scan) → join on token (both sides
    * already hash-partitioned by the aggregate) → per-source rollup of
    * |sources| rows. */
  def sourceTvDivergence(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    // multiplication operands at DECIMAL(18,0): the product stays inside
    // DECIMAL(37,0) in every engine's widening rule (Spark 18+18+1, DuckDB
    // 18+18) — counts beyond 10^18 tokens would need a wider input type
    val dec = "decimal(18,0)"
    // persisted: consumed by the token rollup, the source rollup and the
    // final join — one (source, token, count) row per distinct pair
    val st = df.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt_st"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = st.groupBy(col("tok")).agg(sum(col("cnt_st")).as("cnt_t"))
    val s = st.groupBy(col("source")).agg(sum(col("cnt_st")).as("total_s"))
    val c = s.agg(sum(col("total_s")).as("total_c"))
    val joined = st.join(t, "tok")
      .join(broadcast(s), "source")
      .join(broadcast(c))
    val inner = joined.groupBy(col("source"))
      .agg(
        first(col("total_s")).as("total_s"),
        first(col("total_c")).as("total_c"),
        sum(abs(col("cnt_st").cast(dec) * col("total_c").cast(dec) -
                col("cnt_t").cast(dec) * col("total_s").cast(dec))).as("a_s"),
        sum(col("cnt_t")).as("seen_c"))
    inner.select(col("source"),
        col("total_s").as("n_tokens"),
        ((col("a_s") +
          (col("total_c").cast(dec) - col("seen_c").cast(dec)) * col("total_s").cast(dec))
          .cast("double") /
         (lit(2.0) * col("total_s").cast("double") * col("total_c").cast("double")))
          .as("tv"))
      .select(col("source"), col("n_tokens"), round(col("tv"), 6).as("tv_dist"))
  }

  /** Per-group n-gram DIVERSITY: document count, total n-gram
    * occurrences, distinct n-grams and the type-token ratio
    * `distinct / total` — the mode-collapse / template-spam detector (a
    * source whose TTR craters is emitting near-identical boilerplate;
    * self-BLEU's cheap exact cousin). `(groupCol, n_docs, n_ngrams,
    * n_distinct, ttr)`, ttr rounded to 6 dp, null for n-gram-less groups.
    *
    * Scale shape: distinct-counting is the two-stage exact form — one
    * map-side-combined aggregate on `(group, gram)` (never
    * `count_distinct`, whose Expand doubles the exploded stream), then a
    * group-keyed rollup of the pair counts. The shuffle carries one row
    * per DISTINCT (group, gram), not per occurrence; doc counts ride a
    * separate digest-sized aggregate (the exploded path can't count
    * gram-less documents). */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
                     n: Int): DataFrame = {
    graft.functions.ShingleList.register(df.sparkSession)
    val pairs = df.select(col(groupCol).as("g"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("g"),
        explode(call_function(graft.functions.ShingleList.Name,
          col("__toks"), lit(n))).as("gram"))
      .groupBy(col("g"), col("gram")).agg(count(lit(1)).as("c"))
    val rolled = pairs.groupBy(col("g"))
      .agg(sum(col("c")).as("n_ngrams"), count(lit(1)).as("n_distinct"))
    df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n_docs"))
      .join(rolled, Seq("g"), "left_outer")
      .select(col("g").as(groupCol), col("n_docs"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(coalesce(col("n_ngrams"), lit(0L)) > 0,
          round(col("n_distinct").cast("double") / col("n_ngrams"), 6)).as("ttr"))
  }
}
