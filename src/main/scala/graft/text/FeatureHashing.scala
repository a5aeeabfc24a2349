package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-hashing collision audit (Weinberger et al. 2009's hashing
  * trick, audited): hashing a vocabulary into `B` buckets trades memory
  * for collisions — before a large-scale model ships hashed features,
  * this report says how much signal the chosen B actually merges.
  *
  * Bucket = portable md5 hash of the token (the engine-stable
  * `conv(substr(md5(t),1,8),16,10) mod B` used by every deterministic
  * split in the library — never an engine-private hash, so the oracle
  * reproduces the exact assignment). Per-token collision status weights
  * by OCCURRENCE count too: a collision on two hapax tokens is noise, a
  * collision on two frequent tokens merges real features.
  *
  * One row: `(n_tokens, n_occurrences, n_buckets_used, max_bucket_load,
  * colliding_tokens, colliding_occ_frac)` — load in distinct tokens,
  * fraction at 6 dp.
  *
  * Scale shape: one (token)-keyed corpus aggregate (vocabulary-bounded
  * after it), one bucket rollup, a 1-row summary. */
object FeatureHashing {

  /** Prefix-cache savings report — the serving-side question behind
    * prompt/prefix caching (and the KV-cache sharing vLLM-style
    * engines exploit): across the corpus, how much token mass lives in
    * SHARED document prefixes of length k? Documents with an identical
    * first-k-token prefix share one cache entry; every duplicate
    * beyond the first saves its prefix length.
    *
    * Per k in `ks`: `(k, n_docs, shared_groups, docs_in_shared,
    * saved_tokens, saved_frac)` — `saved = Σ_groups (size−1)·len(prefix)`
    * (a short document's prefix is its whole token list), fraction of
    * total corpus tokens at 6 dp, ordered by k.
    *
    * Scale shape: one tokenization pass fans out to |ks| prefix rows
    * per document; the group key is the prefix STRING (exact sharing,
    * not a hash sketch), one (k, prefix)-keyed aggregate + a k-bounded
    * rollup. */
  def prefixCacheReport(df: DataFrame, textCol: String,
                        ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks == ks.sorted,
      "ks must be ascending positive")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("__t"), size(col("__t")).cast("long").as("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = toks.agg(sum(col("len")), count(lit(1))).collect()(0)
    val (totalTokens, nDocs) = (total.getLong(0), total.getLong(1))
    val kdf = broadcast(ks.toDF("k"))
    val prefixes = toks.crossJoin(kdf)
      .select(col("k"),
        concat_ws(" ", slice(col("__t"), lit(1), col("k"))).as("p"),
        least(col("len"), col("k").cast("long")).as("plen"))
    val groups = prefixes.groupBy(col("k"), col("p"), col("plen"))
      .agg(count(lit(1)).as("sz"))
    val out = groups.groupBy(col("k"))
      .agg(
        sum(when(col("sz") > 1, 1L).otherwise(0L)).as("shared_groups"),
        sum(when(col("sz") > 1, col("sz")).otherwise(0L)).as("docs_in_shared"),
        sum((col("sz") - 1) * col("plen")).as("saved_tokens"))
      .select(col("k"), lit(nDocs).as("n_docs"), col("shared_groups"),
        col("docs_in_shared"), col("saved_tokens"),
        round(col("saved_tokens").cast("double") / totalTokens, 6)
          .as("saved_frac"))
      .orderBy(col("k"))
    toks.unpersist(blocking = false)
    out
  }

  private def bucket(t: Column, b: Int): Column =
    pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(b))

  def collisionReport(df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val toks = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("occ"))
      .withColumn("b", bucket(col("tok"), buckets))
    val perBucket = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("nt"), sum(col("occ")).as("no"))
    toks.join(perBucket.select(col("b"), col("nt").as("__bn")), "b")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("occ")).as("n_occurrences"),
        countDistinct(col("b")).as("n_buckets_used"),
        max(col("__bn")).as("max_bucket_load"),
        sum(when(col("__bn") > 1, 1L).otherwise(0L)).as("colliding_tokens"),
        (sum(when(col("__bn") > 1, col("occ")).otherwise(0L))
          .cast("decimal(38,0)")).as("__cocc"))
      .select(col("n_tokens"), col("n_occurrences"), col("n_buckets_used"),
        col("max_bucket_load"), col("colliding_tokens"),
        round(col("__cocc").cast("double") /
          col("n_occurrences").cast("double"), 6).as("colliding_occ_frac"))
  }
}
