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
  * (N, avgdl) come from a dl-only projection of the same scan, read as
  * a driver scalar. The query-term table is tiny and BROADCAST,
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
    // query vocabulary BEFORE the tf aggregation — the shuffle (and the
    // aggregation hash table) carry query-vocabulary terms only, never
    // the full posting list. (A measured dead end: folding the corpus
    // constants into this pass via a left join + per-doc null bucket
    // saves the second tokenize scan below but pushes EVERY token
    // through the partial aggregation — ~1 s slower at sf0.1.)
    val matched = toks
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("tok"))
      .join(broadcast(qvocab), "tok")
      .groupBy(col("id"), col("dl"), col("tok")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus constants from a dl-only projection (scalar aggregate over
    // the corpus scan). Read as a DRIVER SCALAR, not an in-plan
    // broadcast: a one-row aggregate is microseconds of driver time,
    // where crossJoin(broadcast(consts)) serializes an extra AQE
    // broadcast wave into every downstream stage (the PageRank
    // dangling-mass lesson).
    val constRow = toks.filter(size(col("__toks")) > 0)
      .agg(count(lit(1)).as("n_docs"),
        avg(size(col("__toks")).cast("long")).as("avgdl"))
      .head()
    val nDocs = constRow.getLong(0)
    val avgdl = if (constRow.isNullAt(1)) 1.0 else constRow.getDouble(1)
    // df as a count-over-window on the matched postings (each document
    // containing a term contributes exactly one row per term, so the
    // per-term partition count IS the df) — same shuffle size as a
    // groupBy(tok) aggregate but no separate idf-table build + broadcast
    // wave on the critical path
    val wTok = Window.partitionBy(col("tok"))
    val scored = matched
      .withColumn("idf", log(lit(1.0) +
        (lit(nDocs) - count(lit(1)).over(wTok) + 0.5) /
          (count(lit(1)).over(wTok) + 0.5)))
      .join(broadcast(qterms), "tok")
      .withColumn("term_score",
        (col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
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
