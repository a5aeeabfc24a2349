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
  * Scale shape: the corpus scan explodes tokens and CUTS THEM TO THE
  * QUERY VOCABULARY map-side (broadcast semi-join on the distinct query
  * terms) BEFORE the tf aggregation — the only corpus-sized shuffle
  * carries `(doc, dl, matched-term)` rows for query-vocabulary terms
  * only, never the full posting list; the document length rides the
  * grouping key (functionally dependent on the doc — no separate length
  * join). Document frequency derives from the MATCHED postings (every
  * document containing a query term appears there exactly once per
  * term, so per-term row counts ARE the df); the corpus constants
  * (N, avgdl) come from a dl-only projection of the same scan — neither
  * re-tokenizes. The query-term and idf tables are tiny and BROADCAST,
  * so scoring is map-side over the matched postings and only matched
  * `(qid, doc)` partial scores enter the final aggregate.
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
    val toks = corpus
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
    // distinct query terms (duplicate terms in a query text score once —
    // the standard bag-of-query-TERMS formulation)
    val qterms = queries
      .select(col(qidCol).as("qid"), TextAnalysis.tokens(col(qtextCol)).as("__qt"))
      .select(col("qid"), explode(array_distinct(col("__qt"))).as("tok"))
    val qvocab = qterms.select(col("tok")).distinct()
    // matched postings: exploded tokens are semi-joined to the broadcast
    // query vocabulary BEFORE the tf aggregation — the shuffle carries
    // query-vocabulary terms only, never the corpus's full posting list
    val matched = toks
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("tok"))
      .join(broadcast(qvocab), "tok")
      .groupBy(col("id"), col("dl"), col("tok")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus constants from a dl-only projection (no explode, no shuffle
    // beyond the scalar aggregate); df from the matched postings — each
    // document containing a term contributes exactly one row per term
    val consts = toks.filter(size(col("__toks")) > 0)
      .agg(count(lit(1)).as("n_docs"),
        avg(size(col("__toks")).cast("long")).as("avgdl"))
    val qdf = matched.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(consts))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .select(col("tok"), col("idf"), col("avgdl"))
    val scored = matched
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
