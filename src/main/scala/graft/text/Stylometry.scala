package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Burrows' Delta (Burrows 2002) — the stylometric distance between
  * corpus SOURCES: z-score each source's relative frequency of the
  * top-K corpus words (the "function word" profile — style lives in
  * the head vocabulary, topic in the tail), then average the absolute
  * z-differences per source pair. The attribution/contamination lens
  * the divergence family lacks: TV/cosine ([[CorpusStats]]) weigh raw
  * mass, Delta weighs how UNUSUALLY each source uses the common words.
  *
  * Pipeline (all frames bounded by |sources| × K after one corpus
  * pass):
  *
  *  1. (source, token) counts + per-source totals — the one corpus
  *     aggregate;
  *  2. global top-K tokens by total count (ties by token);
  *  3. the source×top-K grid (absent words are TRUE zero frequencies —
  *     a source never using "the" is a stylometric signal, not a null);
  *  4. relative frequencies pinned once to 9-dp longs; per-word
  *     population mean/σ across sources from exact integer sums;
  *     z-scores pinned to 6-dp longs (zero-variance words drop,
  *     K_eff reported);
  *  5. per-pair Delta = Σ|z_a − z_b| / K_eff — an exact integer sum
  *     with one division.
  *
  * Output per unordered source pair: `(source_a, source_b, k_eff,
  * delta)` at 4 dp, ordered by (source_a, source_b). */
object Stylometry {

  def burrowsDelta(df: DataFrame, sourceCol: String, textCol: String,
                   topK: Int): DataFrame = {
    require(topK >= 2, s"topK must be >= 2: $topK")
    val toks = df
      .select(col(sourceCol).as("src"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("src"), col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = toks.groupBy(col("src")).agg(sum(col("c")).as("tot"))
    val top = toks.groupBy(col("tok")).agg(sum(col("c")).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(topK)
      .select(col("tok"))
    val grid = totals.crossJoin(broadcast(top))
    val rf = grid
      .join(toks, Seq("src", "tok"), "left")
      .select(col("src"), col("tok"),
        round(coalesce(col("c"), lit(0L)).cast("double") /
          col("tot") * lit(1e9)).cast("long").as("rf9"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val nSrc = totals.count()
    val stats = rf.groupBy(col("tok"))
      .agg(sum(d(col("rf9"))).as("s1"), sum(d(col("rf9")) * d(col("rf9")))
        .as("s2"))
      .select(col("tok"),
        (col("s1").cast("double") / nSrc).as("mu"),
        sqrt((col("s2").cast("double") / nSrc) -
          (col("s1").cast("double") / nSrc) *
          (col("s1").cast("double") / nSrc)).as("sigma"))
      .where(col("sigma") > 0)
    val z = rf.join(broadcast(stats), "tok")
      .select(col("src"), col("tok"),
        round((col("rf9").cast("double") - col("mu")) / col("sigma")
          * lit(1e6)).cast("long").as("z6"))
    val pairs = z.alias("a").join(z.alias("b"),
        col("a.tok") === col("b.tok") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("k_eff"),
        sum(abs(col("a.z6") - col("b.z6"))).as("__s6"))
      .select(col("source_a"), col("source_b"), col("k_eff"),
        round(col("__s6").cast("double") / col("k_eff") / 1e6, 4).as("delta"))
      .orderBy(col("source_a"), col("source_b"))
    pairs
  }
}
