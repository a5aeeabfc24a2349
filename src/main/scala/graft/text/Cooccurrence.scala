package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token co-occurrence / PMI mining at document granularity: which token
  * pairs appear together far more often than chance — collocation
  * discovery, taxonomy seeding, embedding-evaluation probes over a
  * training corpus.
  *
  * `pmi(x,y) = ln( N · c_xy / (c_x · c_y) )` over DOCUMENT-level
  * co-occurrence counts (a pair counts once per document containing
  * both), with `N` = corpus document count.
  *
  * Scale shape — the whole point is bounding the quadratic blowup: the
  * pair space is restricted to a TOP-`V` vocabulary by document
  * frequency (deterministic ties on the token string), so per-document
  * pair generation is over the ≤V vocabulary tokens a document actually
  * contains, never its full distinct-token set. The vocabulary (V rows,
  * driver-small by construction) rides the second corpus scan as a
  * [[graft.functions.VocabTf]] probe set, and pair expansion is the
  * codegen'd [[graft.functions.SortedPairs]] — no exploded-token
  * self-join, no per-token row between the scan and the pair aggregate.
  * The only large shuffles are the doc-frequency aggregate (token-keyed,
  * map-side combined) and the pair count (pair-keyed, map-side
  * combined). At a fixed V the pair frame is ≤V²/2 rows regardless of
  * corpus size. Top-V selection itself is a distributed TakeOrdered
  * (sort+limit), never a single-partition global window.
  */
object Cooccurrence {

  /** Top-`k` token pairs by PMI among the top-`vocab` tokens, keeping
    * pairs co-occurring in at least `minSupport` documents. Output:
    * `(tok_a, tok_b, n_pair, pmi)` — tok_a < tok_b, pmi rounded to 4 dp,
    * ordered by (pmi desc, tok_a, tok_b) with deterministic ties. */
  def pmiPairs(docs0: DataFrame, idCol: String, textCol: String,
               vocab: Int, minSupport: Long, k: Int): DataFrame = {
    val spark = docs0.sparkSession
    graft.functions.VocabTf.register(spark)
    graft.functions.SortedPairs.register(spark)
    // widen the narrow scan: BOTH corpus passes (df aggregate and the
    // VocabTf+SortedPairs pair projection, the hot stage) otherwise run
    // on the scan's 2-3 row-group partitions (0.7 s → 0.1 s at sf0.1)
    val docs = graft.operators.Spread.widen(docs0, col(idCol))
    val docToks = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
    val nDocs = docs.count()
    // top-V vocabulary by (df desc, tok) — distributed top-k, collected
    // (V rows by construction: the driver-bounded knob of the operator)
    val topRows = docToks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(vocab)
      .collect()
    val vocabArr: Array[String] = topRows.map(_.getString(0))
    // per-document vocab-token pairs in one codegen'd projection: the
    // VocabTf map keys ARE the document's distinct in-vocabulary tokens
    val pairs = docs
      .select(call_function(graft.functions.SortedPairs.Name,
        map_keys(call_function(graft.functions.VocabTf.Name,
          TextAnalysis.tokens(col(textCol)), lit(vocabArr)))).as("__ps"))
      .select(explode(col("__ps")).as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    import spark.implicits._
    val dfDf = topRows.map(r => (r.getString(0), r.getLong(1))).toSeq.toDF("tok", "df")
    pairs
      .join(broadcast(dfDf.toDF("tok_a", "df_a")), "tok_a")
      .join(broadcast(dfDf.toDF("tok_b", "df_b")), "tok_b")
      .withColumn("pmi", round(
        log(lit(nDocs.toDouble) * col("n_pair") /
          (col("df_a") * col("df_b"))), 4))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(k)
      .select(col("tok_a"), col("tok_b"), col("n_pair"), col("pmi"))
  }
}
