package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained text CLASSIFIERS for curation — the two standard
  * model-based selection signals a training-data pipeline runs beside
  * the heuristic filters (`TextAnalysis`, `HeuristicFilters`):
  *
  *  - [[naiveBayesEval]]: multinomial Naive Bayes with add-one
  *    smoothing (McCallum & Nigam 1998) — the classic fastText-class
  *    linear baseline behind language-ID and GPT-3-style quality
  *    classifiers, trained and evaluated wholly inside the engine;
  *  - [[dsirWeights]]: hashed-n-gram importance weights
  *    (Data Selection via Importance Resampling, Xie et al. 2023):
  *    `log w(d) = Σ_b n_b(d) · (ln p_target(b) − ln p_raw(b))` — rank
  *    the raw corpus by how target-domain-like each document is.
  *
  * Determinism/oracle contract: all counts are exact longs; the ONLY
  * transcendental is one `ln` per MODEL ENTRY (vocab/bucket-bounded,
  * never per document), pinned to a 1e6-scale long immediately — per-doc
  * scores are exact integer sums of pinned weights, so both engines rank
  * identically (the q381 pin pattern; a 1-ulp `ln` divergence flips a
  * weight with probability ~1e-10 and moves a score by 1e-6).
  *
  * Scale shape (both): one exploded-token aggregate over the corpus
  * (map-side combined, vocabulary/bucket-bounded result), model joined
  * back broadcast, one doc-keyed aggregate for scores. Nothing
  * corpus-sized on the driver.
  */
object Classify {

  private def toks(textCol: Column): Column =
    split(lower(trim(textCol)), "\\s+")

  /** ln pinned to a 1e6-scale long. */
  private def ln6(c: Column): Column =
    round(log(c) * lit(1e6)).cast("long")

  /** Train multinomial NB on the `pmod(id, splitMod) < splitMod-1`
    * rows, score the held-out fold, report per-class accuracy:
    * `(label, n_docs, n_correct, accuracy)` ascending by label.
    *
    * Unseen-in-class tokens get the smoothed `1/(tot_c + V)` mass via a
    * per-class default weight; tokens absent from the TRAIN vocabulary
    * entirely contribute the same class default (standard add-one
    * treatment with the train-vocab V). Prediction = argmax of
    * `prior + Σ token weights`, ties to the lexicographically first
    * label. */
  def naiveBayesEval(df: DataFrame, idCol: String, textCol: String,
                     labelCol: String, splitMod: Int = 5): DataFrame = {
    val scored = nbScores(df, idCol, textCol, labelCol, splitMod)
    val best = scored
      .groupBy(col("id"), col("label"))
      .agg(min(struct((-col("score6")).as("ns"), col("cls"))).as("m"))
      .select(col("label"), (col("m.cls") === col("label"))
        .cast("long").as("ok"))
    best.groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_correct"))
      .select(col("label"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_docs"), 4)
          .as("accuracy"))
      .orderBy(col("label"))
  }

  /** Held-out per-(doc, class) pinned NB log-scores `(id, label, cls,
    * score6)` — the shared core of [[naiveBayesEval]] and
    * [[marginCalibration]]. */
  private def nbScores(df: DataFrame, idCol: String, textCol: String,
                       labelCol: String, splitMod: Int): DataFrame = {
    require(splitMod >= 2, s"need splitMod >= 2: $splitMod")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(labelCol).as("label"), toks(col(textCol)).as("ts"))
    val isTrain = pmod(col("id"), lit(splitMod)) < splitMod - 1
    val train = base.filter(isTrain)
    val test = base.filter(!isTrain)
    // (label, token) occurrence counts; class totals; train vocab size
    val tokCnt = train.select(col("label"), explode(col("ts")).as("t"))
      .groupBy(col("label"), col("t")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // three consumers: totals, weights, |V|
    val classTot = tokCnt.groupBy(col("label")).agg(sum(col("c")).as("tot"))
    val vocab = tokCnt.select(col("t")).distinct()
      .agg(count(lit(1)).as("v"))
    val priors = train.groupBy(col("label")).agg(count(lit(1)).as("nd"))
    val nTrain = train.agg(count(lit(1)).as("n"))
    // per-class scoring constants: pinned prior + pinned default weight
    val classes = classTot.crossJoin(broadcast(vocab))
      .join(priors, "label").crossJoin(broadcast(nTrain))
      .select(col("label").as("cls"),
        ln6(col("nd").cast("double") / col("n")).as("prior6"),
        ln6(lit(1.0) / (col("tot") + col("v"))).as("dflt6"),
        (col("tot") + col("v")).as("denom"))
    val weights = tokCnt
      .join(classes.select(col("cls").as("label"), col("denom")), "label")
      .select(col("label").as("cls"), col("t"),
        ln6((col("c") + 1).cast("double") / col("denom")).as("w6"))
    // score: every test token occurrence × every class; absent (token,
    // class) weights coalesce to the class default
    val occurrences = test.select(col("id"), col("label"),
      explode(col("ts")).as("t"))
    val scored = occurrences.crossJoin(broadcast(classes.select(
        col("cls"), col("prior6"), col("dflt6"))))
      .join(broadcast(weights), Seq("cls", "t"), "left")
      .groupBy(col("id"), col("label"), col("cls"))
      .agg((first(col("prior6")) +
        sum(coalesce(col("w6"), col("dflt6")))).as("score6"))
    scored
  }

  /** CONFIDENCE-CALIBRATION audit of the NB classifier: is the score
    * MARGIN (best minus second-best pinned log-score — an exact integer,
    * no per-document transcendental) predictive of accuracy? Held-out
    * docs rank by (margin, id) into `buckets` equal-frequency bins; a
    * calibrated classifier shows accuracy rising monotonically with the
    * margin decile, and the low-margin bins are exactly the slices a
    * routing/abstention policy should re-route. One row per bucket:
    * `(bucket, n_docs, margin_lo, margin_hi, accuracy)` (margins in
    * log-units at 6 dp, the 1e-6 pin grid).
    *
    * Scale shape: rides [[nbScores]] (one corpus scan, broadcast model);
    * best/second-best is a per-doc class fold (classes-bounded), the
    * bucket cut is a distributed exact rank
    * ([[graft.operators.Positional.withRowIndexCounted]] — never a
    * single-partition window), and the rollup is buckets-bounded. */
  def marginCalibration(df: DataFrame, idCol: String, textCol: String,
                        labelCol: String, splitMod: Int = 5,
                        buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2: $buckets")
    val scored = nbScores(df, idCol, textCol, labelCol, splitMod)
    // best + runner-up via one classes-bounded sorted fold per doc; ties
    // on score break to the lexicographically first class, matching the
    // naiveBayesEval argmax. A single-class model has no runner-up —
    // margin 0 by convention (maximally uncertain).
    val perDoc = scored.select(col("id"), col("label"),
        struct((-col("score6")).as("ns"), col("cls")).as("sc"))
      .groupBy(col("id"), col("label"))
      .agg(sort_array(collect_list(col("sc"))).as("all"))
      .select(col("id"), col("label"),
        col("all").getItem(0).getField("cls").as("pred"),
        (-col("all").getItem(0).getField("ns")).as("best6"),
        coalesce(-col("all").getItem(1).getField("ns"),
          -col("all").getItem(0).getField("ns")).as("second6"))
      .select(col("id"),
        (col("pred") === col("label")).cast("long").as("ok"),
        (col("best6") - col("second6")).as("margin6"))
    val (indexed, nRows) = graft.operators.Positional.withRowIndexCounted(
      perDoc, Seq(col("margin6"), col("id")), "__r")
    indexed
      .select(col("ok"), col("margin6"),
        ceil((col("__r") + 1L) * buckets / lit(nRows.toDouble))
          .cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("margin6")).cast("double") / 1e6, 6).as("margin_lo"),
        round(max(col("margin6")).cast("double") / 1e6, 6).as("margin_hi"),
        round(sum(col("ok")).cast("double") / count(lit(1)), 4)
          .as("accuracy"))
      .orderBy(col("bucket"))
  }

  /** DSIR log-importance of every document under hashed-unigram bag
    * models of the `targetFilter` rows (target) vs the whole input
    * (raw): `(id, n_tokens, log_w, log_w_per_tok)`, top `k` by
    * (log_w desc, id). Buckets are the portable md5 hash mod `buckets`
    * ([[graft.operators.Sharding.hash32]]), so feature extraction is
    * engine-reproducible; both bucket models use add-one smoothing. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetFilter: Column, buckets: Int, k: Int): DataFrame = {
    require(buckets >= 2 && k >= 1, s"bad params: $buckets, $k")
    val occ = df.select(col(idCol).cast("long").as("id"),
        targetFilter.as("is_t"), explode(toks(col(textCol))).as("t"))
      .select(col("id"), col("is_t"),
        (graft.operators.Sharding.hash32(col("t")) % buckets).as("b"))
    // one corpus fold to per-(doc,bucket) counts — feeds both the two
    // bucket models (bucket-bounded) and the scoring join
    val docBuckets = occ.groupBy(col("id"), col("is_t"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tgt = docBuckets.filter(col("is_t"))
      .groupBy(col("b")).agg(sum(col("n")).as("ct"))
    val raw = docBuckets.groupBy(col("b")).agg(sum(col("n")).as("cr"))
    val tots = docBuckets.agg(
      sum(when(col("is_t"), col("n")).otherwise(0L)).as("tt"),
      sum(col("n")).as("tr"))
    // pinned per-bucket weight: ln p_target − ln p_raw (add-one over
    // the bucket space on both models)
    val w = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tots))
      .select(col("b"),
        (ln6((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("tt") + buckets)) -
          ln6((col("cr") + 1).cast("double") / (col("tr") + buckets)))
          .as("w6"))
    docBuckets
      .join(broadcast(w), "b")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_tokens"), sum(col("n") * col("w6")).as("s6"))
      .select(col("id"), col("n_tokens"),
        round(col("s6").cast("double") / 1e6, 4).as("log_w"),
        round(col("s6").cast("double") / 1e6 / col("n_tokens"), 6)
          .as("log_w_per_tok"))
      .orderBy(col("log_w").desc, col("id"))
      .limit(k)
  }
}
