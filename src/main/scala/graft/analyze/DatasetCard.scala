package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Per-source DATASET CARD: the one-stop corpus report every training
  * run's data section starts from — volume, token mass, quality
  * distribution, exact-duplicate rate and dominant language per source,
  * in one frame. The reporting composition over the library's own
  * primitives (quality scoring, fingerprinting, exact percentiles).
  *
  * Scale shape: ONE corpus scan projects every per-doc signal
  * (token count, quality, content digest — all codegen projections);
  * everything downstream aggregates per source. The duplicate rate is
  * the two-stage exact distinct count (one row per distinct
  * (source, digest) through the shuffle — never `count_distinct`'s
  * Expand), the language mode is a (source, lang) count rolled up by
  * min-struct (deterministic ties: higher count, then lexicographic
  * lang), and the quality percentile sees the per-doc scores only. The
  * three per-source frames are source-cardinality-sized and join
  * broadcast. */
object DatasetCard {

  /** Order-invariant CONTENT DIGEST of a whole frame — the dataset-
    * versioning primitive: two corpus versions are byte-identical (as
    * multisets of rows) iff their digests match, regardless of row
    * order, partitioning, file layout or engine. Per row, the canonical
    * string (all `cols` string-cast, joined on `\u0001`, nulls encoded
    * `\u0002`) md5s into two independent 60-bit slices whose
    * COMMUTATIVE exact sums (plus the row count) form the digest — 120
    * bits of collision margin, one map-side-combined aggregate, no sort
    * anywhere. One row: `(n_rows, digest_lo, digest_hi)` as decimal
    * strings. Callers pass integer/string columns only — float and
    * timestamp RENDERING is engine-specific and would break the
    * cross-engine contract. */
  def contentDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val canon = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val h = md5(canon)
    def slice(from: Int) =
      conv(substring(h, from, 15), 16, 10).cast("decimal(38,0)")
    df.agg(count(lit(1)).as("n_rows"),
      sum(slice(1)).cast("string").as("digest_lo"),
      sum(slice(17)).cast("string").as("digest_hi"))
  }

  /** `(source, n_docs, n_tokens, mean_quality, p50_quality, dup_frac,
    * top_lang)` — mean/percentile to 4 dp, dup_frac = 1 −
    * distinct-content/docs to 4 dp. */
  def perSource(docs: DataFrame, sourceCol: String, langCol: String,
                textCol: String): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"), col(langCol).as("lang"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_toks"),
      TextAnalysis.qualityScore(col(textCol)).as("q"),
      md5(col(textCol)).as("h"))
    val main = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        // split-long mean (graft.operators.ExactAgg): DuckDB's
        // avg(DECIMAL) is a DOUBLE mean, so a decimal mean here diverges
        // at 4 dp half-boundaries (sf0.1 hit .67485 exactly); the
        // textually-mirrored integer formulation is identical on both
        graft.operators.ExactAgg.davg(col("q"), 4).as("mean_quality"),
        // percentile over the 6 dp QUANTIZED longs: the even-count median
        // midpoint (a+b)/2 is then exact integer-or-half double on both
        // engines, where interpolating raw doubles let Spark's (a+b)/2
        // and DuckDB's lo+(hi-lo)·f land on opposite sides of a 4 dp
        // rounding boundary (sf0.1 hit .67485 exactly)
        (round(expr("percentile(CAST(round(q * 1000000) AS BIGINT), 0.5)")
          / lit(100.0)) / lit(10000.0)).as("p50_quality"))
    // count(col) not count(*): the NULL-text digest group must not count
    // as a distinct content value (the oracle's count(DISTINCT h)
    // likewise excludes NULLs)
    val dups = base.groupBy(col("source"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(col("h")).as("n_distinct"), sum(col("c")).as("n_all"))
      .select(col("source"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_all"), 4)
          .as("dup_frac"))
    val langMode = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      // the null-flag field emulates NULLS LAST on the tie-break (Spark
      // struct-min otherwise ranks a NULL lang before every real lang;
      // the oracle's ORDER BY lang puts NULLs last)
      .agg(min(struct((-col("c")).as("nc"), col("lang").isNull.as("ln"),
        col("lang").as("l"))).as("__m"))
      .select(col("source"), col("__m.l").as("top_lang"))
    main.join(broadcast(dups), "source").join(broadcast(langMode), "source")
  }
}
