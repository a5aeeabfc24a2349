package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.fpm.{FPGrowth, PrefixSpan}

/** Frequent-pattern mining over per-entity item baskets — the market-basket
  * and behavioral-sequence layer of the analytics stack (reference anchor:
  * the per-class count rollups of `process_logs_v10.py` §counts, taken from
  * marginals to co-occurrence).
  *
  * Three rungs, per the builder's preference ladder:
  *  - [[frequentPairs]] composes built-ins only — distinct + self-join with
  *    an `a < b` prefix cut, the exact 2-itemset lattice level. Support
  *    counts are exact and SQL-oracle-able.
  *  - [[fpGrowth]] / [[prefixSpan]] wrap spark.ml's distributed FP-Growth
  *    (Han 2000, PFP: Li 2008) and PrefixSpan (Pei 2001) for the full
  *    variable-length lattice; their outputs are flattened to stable
  *    string keys and deterministic order so results remain comparable.
  *
  * Scale shape: frequentPairs shuffles the distinct (entity, item) frame
  * once on the entity key; the self-join is per-entity (baskets are small
  * — bounded by the item vocabulary), and the pair rollup keys on ≤|V|²/2
  * pairs. FP-Growth/PrefixSpan shuffle `collect_set`/`collect_list`
  * baskets once, then mine group-partitioned projected databases — both
  * are the published distributed formulations, not driver loops.
  */
object Itemsets {

  /** Exact support counts for item PAIRS: number of entities whose basket
    * contains both. `minSupport` is an absolute entity count. */
  def frequentPairs(df: DataFrame, entityCol: String, itemCol: String,
                    minSupport: Long): DataFrame = {
    val b = df.select(col(entityCol).as("e"), col(itemCol).as("item")).distinct()
    val l = b.select(col("e"), col("item").as("item_a"))
    val r = b.select(col("e"), col("item").as("item_b"))
    l.join(r, Seq("e")).filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
  }

  /** Association rules from the exact pair lattice: both directions of
    * every frequent pair as `(antecedent, consequent, supp_ab, supp_a,
    * confidence, lift)` — confidence = supp(ab)/supp(a), lift =
    * supp(ab)·N / (supp(a)·supp(b)) with N = basket count. All supports
    * are exact entity counts (one distinct + one self-join per basket,
    * the [[frequentPairs]] shape plus an item-support broadcast); the
    * two ratios are single divisions of exact integers, 6 dp. Ordered by
    * lift desc then (antecedent, consequent) — deterministic because the
    * rounded lift is a pure function of exact integer supports. */
  def associationRules(df: DataFrame, entityCol: String, itemCol: String,
                       minSupport: Long): DataFrame = {
    val b = df.select(col(entityCol).as("e"), col(itemCol).as("item")).distinct()
    val n = b.agg(countDistinct(col("e")).as("__n"))
    val itemSupp = b.groupBy(col("item")).agg(count(lit(1)).as("supp"))
    val pairs = frequentPairs(df, entityCol, itemCol, minSupport)
      .withColumnRenamed("support", "supp_ab")
    val directed = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("supp_ab"))
      .unionAll(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("supp_ab")))
    directed
      .join(broadcast(itemSupp.select(col("item").as("antecedent"),
        col("supp").as("supp_a"))), Seq("antecedent"))
      .join(broadcast(itemSupp.select(col("item").as("consequent"),
        col("supp").as("supp_b"))), Seq("consequent"))
      .join(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("supp_ab"),
        col("supp_a"),
        round(col("supp_ab").cast("double") / col("supp_a").cast("double"), 6)
          .as("confidence"),
        round(col("supp_ab").cast("double") * col("__n").cast("double") /
          (col("supp_a").cast("double") * col("supp_b").cast("double")), 6)
          .as("lift"))
      .orderBy(desc("lift"), col("antecedent"), col("consequent"))
  }

  /** Distributed FP-Growth itemsets: `(itemset, freq)` with the itemset
    * rendered as a sorted comma-joined string (deterministic key). */
  def fpGrowth(df: DataFrame, entityCol: String, itemCol: String,
               minSupportFraction: Double): DataFrame = {
    val baskets = df.groupBy(col(entityCol).as("e"))
      .agg(collect_set(col(itemCol)).as("items"))
    val model = new FPGrowth().setItemsCol("items")
      .setMinSupport(minSupportFraction).setMinConfidence(0.5)
      .fit(baskets)
    model.freqItemsets
      .select(array_join(array_sort(col("items")), ",").as("itemset"),
        col("freq"))
      .orderBy(col("freq").desc, col("itemset"))
  }

  /** Distributed PrefixSpan sequential patterns over per-entity event
    * sequences ordered by `(tsCol, tieCol)`: `(pattern, freq)` where
    * pattern is `a>b>…` (each step a single item). `maxLen` bounds the
    * pattern length — at `maxLen = 2` the result is exactly the
    * SQL-expressible "a then later b" subsequence count.
    *
    * PRECONDITION: `(tsCol, tieCol)` must be a STRICT total order within
    * each entity (i.e. `tieCol` unique per entity at equal timestamps —
    * an event id, never a coarse category). With duplicate keys the
    * generic miner breaks the remaining tie by item and counts equal-key
    * events as ordered, while the `maxLen = 2` relational form
    * (`first(a) < last(b)`) treats them as unordered — the two paths
    * would silently diverge. Every in-repo caller passes a unique event
    * id; new callers with coarse timestamps must too. */
  def prefixSpan(df: DataFrame, entityCol: String, itemCol: String,
                 tsCol: String, tieCol: String,
                 minSupportFraction: Double, maxLen: Int): DataFrame = {
    if (maxLen == 2)
      return prefixSpanL2(df, entityCol, itemCol, tsCol, tieCol,
        minSupportFraction)
    val seqs = df
      .withColumn("__k", struct(col(tsCol), col(tieCol)))
      .groupBy(col(entityCol).as("e"))
      .agg(sort_array(collect_list(struct(col("__k"), col(itemCol).as("i"))))
        .as("s"))
      .select(transform(col("s"), x => array(x.getField("i"))).as("sequence"))
    val ps = new PrefixSpan().setMinSupport(minSupportFraction)
      .setMaxPatternLength(maxLen).setSequenceCol("sequence")
    ps.findFrequentSequentialPatterns(seqs)
      .select(
        array_join(transform(col("sequence"), s => array_join(s, "+")), ">")
          .as("pattern"),
        col("freq"))
      .orderBy(col("freq").desc, col("pattern"))
  }

  /** The `maxLen = 2` lattice level as plain relational algebra — output
    * identical to the spark.ml miner above (PatternMiningSpec pins the
    * order semantics; the q157 DuckDB twin hash-matches both forms).
    *
    * The identity: `<a,b>` is supported by a sequence iff some `a` occurs
    * STRICTLY before some `b`, i.e. iff `first(a) < last(b)` under the
    * (ts, tie) total order — including `a = b` (first < last ⟺ the item
    * occurs twice). So one (entity, item) min/max aggregate (map-side
    * partials; the miner's collect_list ships every event) replaces the
    * projected-database rounds, and the pair join runs on the vocab-
    * bounded per-entity item frame, never on raw events. `freq ≥
    * ceil(support · n)` reproduces spark.ml's `math.ceil` double cut. */
  private def prefixSpanL2(df: DataFrame, entityCol: String, itemCol: String,
                           tsCol: String, tieCol: String,
                           minSupportFraction: Double): DataFrame = {
    // first/last occurrence key per (entity, item); materialized once —
    // consumed by the sequence count, the 1-patterns and both pair sides
    val fl = df
      .select(col(entityCol).as("e"), col(itemCol).as("i"),
        struct(col(tsCol), col(tieCol)).as("k"))
      .groupBy(col("e"), col("i"))
      .agg(min(col("k")).as("f"), max(col("k")).as("l"))
      .localCheckpoint(true)
    val n = fl.select(col("e")).distinct().agg(count(lit(1)).as("n"))
    // (e, i) is distinct, so per-entity pattern hits count once each
    val s1 = fl.groupBy(col("i").as("pattern"))
      .agg(count(lit(1)).as("freq"))
    val s2 = fl.alias("a")
      .join(fl.alias("b"),
        col("a.e") === col("b.e") && col("a.f") < col("b.l"))
      .groupBy(concat(col("a.i"), lit(">"), col("b.i")).as("pattern"))
      .agg(count(lit(1)).as("freq"))
    s1.unionAll(s2)
      .crossJoin(broadcast(n))
      .where(col("freq") >= ceil(lit(minSupportFraction) * col("n")))
      .select(col("pattern"), col("freq"))
      .orderBy(col("freq").desc, col("pattern"))
  }
}
