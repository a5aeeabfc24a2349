package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson & Zaragoza 2009, the Okapi BM25
  * formulation with the Lucene-style non-negative idf): score every
  * corpus document against a (small) query set and keep the top-k per
  * query — the retrieval half of a RAG / data-curation stack (nearest
  * neighbors by LEXICAL match, complementing the embedding ANN path in
  * [[graft.sim.Similarity]]).
  *
  * `score(D, Q) = Σ_{t ∈ Q∩D} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))`
  * with `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`.
  *
  * Scale shape: ONE corpus scan builds `(doc, term, tf)` postings via an
  * exploded map-side-combined aggregation, with the document length
  * carried through the grouping key (functionally dependent on the doc —
  * no separate length join). Document frequency and the corpus constants
  * (N, avgdl) derive from the POSTINGS, never a second text scan; the
  * df table is cut to query terms before it goes anywhere. The
  * query-term table is tiny and BROADCAST, so scoring is a map-side join
  * over the postings — the corpus never shuffles on text, and only
  * matched `(qid, doc)` partial scores enter the final aggregate.
  *
  * Engine-portable determinism: every per-term score is a pure double
  * expression (identical on any IEEE engine); the per-document SUM is
  * carried in DECIMAL(27,12) — order-invariant at any partitioning —
  * and ranks tie-break by doc id on the unrounded decimal. */
object Bm25 {

  /** Top-`k` corpus documents per query. Queries are `(qidCol,
    * qtextCol)` rows — must be small enough to broadcast (benchmark /
    * probe sets). Output: `(qid, doc_id, rank, score)`, score rounded to
    * 4 dp. */
  def topK(corpus: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, qtextCol: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // (doc, dl, term, tf) postings: dl (whitespace token count) rides the
    // grouping key — same cardinality, no length join afterwards
    val postings = corpus
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("tok"))
      .groupBy(col("id"), col("dl"), col("tok")).agg(count(lit(1)).as("tf"))
    // distinct query terms (duplicate terms in a query text score once —
    // the standard bag-of-query-TERMS formulation)
    val qterms = queries
      .select(col(qidCol).as("qid"), TextAnalysis.tokens(col(qtextCol)).as("__qt"))
      .select(col("qid"), explode(array_distinct(col("__qt"))).as("tok"))
    // document frequency + corpus constants from the postings (digest-
    // sized aggregations, never a second corpus scan); df is cut to
    // query terms BEFORE the constants ride along, so the broadcast side
    // is O(|query vocabulary|)
    val consts = postings.select(col("id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qdf = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .join(broadcast(qterms.select(col("tok")).distinct()), "tok")
      .crossJoin(broadcast(consts))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .select(col("tok"), col("idf"), col("avgdl"))
    val scored = postings
      .join(broadcast(qterms), "tok")
      .join(broadcast(qdf), "tok")
      .withColumn("term_score",
        (col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .cast("decimal(27,12)"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("term_score")).as("score_d"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_d").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("doc_id"), col("rank").cast("long").as("rank"),
        round(col("score_d"), 4).cast("double").as("score"))
  }
}
