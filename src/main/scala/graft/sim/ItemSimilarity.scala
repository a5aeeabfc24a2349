package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item collaborative-filtering similarity (Sarwar et al. 2001 /
  * Linden et al. 2003) over (basket, item) incidence — "items bought
  * together" as COSINE over binary basket vectors:
  * `sim(i,j) = c_ij / √(c_i · c_j)` with `c_i` = baskets containing i
  * and `c_ij` = baskets containing both. The normalized sibling of the
  * raw-support co-occurrence edge builder
  * ([[graft.graph.LinkPrediction.coOccurrenceEdges]]): support favors
  * popular items, cosine surfaces items whose co-occurrence is high
  * RELATIVE to their popularity.
  *
  * Scale shape: identical to the edge builder — one basket-keyed corpus
  * shuffle, in-basket pair expansion via the codegen'd self-join, a
  * pair-keyed support count — plus one item-bounded degree aggregate
  * broadcast onto the pair frame. The cosine is pinned ONCE to a 12-dp
  * long over exact integer counts (deterministic IEEE expression), so
  * the top-k cut and its (a, b) tie-break are engine-stable.
  *
  * Output: top `k` pairs `(a, b, support, cosine)` ordered by pinned
  * cosine desc, then (a, b); cosine rendered at 6 dp.
  */
object ItemSimilarity {

  def topPairs(df: DataFrame, groupCol: String, itemCol: String,
               minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1 && k >= 1,
      s"need minSupport, k >= 1: $minSupport, $k")
    // The SECOND repartition (after the dedup) is the sharing point:
    // `it` has FOUR consumers (both self-join sides, of which one is a
    // broadcast build, plus two degree aggregates), and AQE stage reuse
    // dedupes materialized EXCHANGES, never the aggregation on top of
    // one — with only the pre-dedup exchange shared, the r13 profile
    // showed the 600 k-row dedup aggregate replaying once per consumer
    // (stages 29/31/33 each reading the full exchange, ~15 CPU-s of
    // repeated dedup at sf0.1). Re-exchanging the deduped rows on the
    // same key costs one extra shuffle of the DISTINCT rows but makes
    // every consumer read the dedup RESULT; at 100 TB one shuffle of
    // distinct (g, i) pairs replaces three replays of the distinct
    // aggregate over the raw corpus. The dedup keeps its own natural
    // hash(g, i) exchange (map-side partial dedup compresses duplicate
    // rows before it), so the g-repartition on top is a genuine
    // redistribution the optimizer cannot elide — a same-key repartition
    // over an already-hash(g)-partitioned dedup is recognized as
    // redundant and silently removed, restoring the per-consumer
    // replays (measured: plan unchanged, dedup still 3×).
    val it = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .dropDuplicates("g", "i")
      .repartition(col("g"))
    val support = it.alias("x").join(it.alias("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    // deg must NOT ride as broadcasts: a broadcast subtree materializes in
    // its own job BEFORE the main plan, so each one re-runs the basket
    // scan + repartition + dedup (and the round-12 deg checkpoint still
    // paid that derivation once more for the checkpoint job itself —
    // profiled as TWO full 600 k-row scan+dedup chains per run). With
    // SHUFFLE_HASH hints the degree joins live in the SAME plan as the
    // support self-join, so all three consumers of `it` read ONE reused
    // repartition exchange: one corpus scan total. The extra exchanges
    // carry only the support-filtered pairs (tiny) and the item-bounded
    // degree table — kilobytes at any scale.
    val deg = it.groupBy(col("i")).agg(count(lit(1)).as("c"))
    val pinned = support
      .join(deg.select(col("i").as("a"), col("c").as("ca")).hint("shuffle_hash"), Seq("a"))
      .join(deg.select(col("i").as("b"), col("c").as("cb")).hint("shuffle_hash"), Seq("b"))
      .withColumn("__s12",
        round(col("support").cast("double") * lit(1e12) /
          sqrt(col("ca").cast("double") * col("cb").cast("double")))
          .cast("long"))
    pinned
      .orderBy(col("__s12").desc, col("a"), col("b"))
      .limit(k)
      .select(col("a"), col("b"), col("support"),
        round(col("__s12").cast("double") / 1e12, 6).as("cosine"))
  }
}
