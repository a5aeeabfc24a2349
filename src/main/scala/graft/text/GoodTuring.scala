package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Good-Turing frequency smoothing over the corpus unigram counts — the
  * language-modeling answer to "how much probability mass belongs to
  * words we have NEVER seen" (Good 1953): `p₀ = N₁/N` (the singleton
  * share), and the smoothed counts `r* = (r+1)·N_{r+1}/N_r` that the
  * raw ML estimate systematically overstates for small r. The
  * frequency-of-frequencies table N_r IS the whole sufficient
  * statistic, so the operator is two hash aggregates and a
  * |small-r|-row join — the corpus is scanned once however large.
  *
  * Output, one row per r ∈ [1, `maxR`]:
  * `(r, n_r, r_star, total_tokens, p_unseen)` — r_star at 6 dp (null
  * when N_{r+1} = 0), totals repeated per row (single-scan
  * convenience), ordered by r. */
object GoodTuring {

  def goodTuring(df: DataFrame, textCol: Column, maxR: Int = 5,
                 n: Int = 1): DataFrame = {
    require(maxR >= 1 && n >= 1, s"need maxR, n >= 1: $maxR, $n")
    // widen a narrow single-row-group scan BEFORE the shingling
    // projection: the n-gram transform is the whole cost of this
    // operator and otherwise runs on the scan's 1-3 tasks while the
    // rest of the cores idle (measured 3.0 s of the 3.8 s total on 3
    // tasks at sf0.1; Spread.widen is a no-op once the input is big
    // enough to split naturally)
    val wide = graft.operators.Spread.widen(
      df.select(textCol.as("__text")), col("__text"))
    val tk = TextAnalysis.tokens(col("__text"))
    // n-gram shingles WITH multiplicity (counts, not the distinct-set
    // frame dedup uses); short docs contribute no shingles
    val grams =
      if (n == 1) tk
      else transform(
        when(size(tk) >= n, sequence(lit(1), size(tk) - (n - 1)))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ", slice(tk, i, lit(n))))
    val toks = wide.select(explode(grams).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("r"))
    val nr = counts.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val tot = nr.agg(sum(d19(col("r")) * d19(col("n_r"))).as("n"),
      sum(when(col("r") === 1, col("n_r")).otherwise(0L)).as("n1"))
    val nxt = nr.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
    nr.filter(col("r") <= maxR)
      .join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        round((col("r") + 1).cast("double") * col("n_next") / col("n_r"), 6)
          .as("r_star"),
        col("n").cast("long").as("total_tokens"),
        round(col("n1").cast("double") / col("n").cast("double"), 6)
          .as("p_unseen"))
      .orderBy(col("r"))
  }
}
