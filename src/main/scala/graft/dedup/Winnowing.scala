package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprint PAIRS — the MOSS-style (Schleimer, Wilkerson,
  * Aiken, SIGMOD 2003) shared-substring detector on top of
  * [[graft.text.TextAnalysis.winnowingFingerprints]]: two documents
  * sharing any substring of length ≥ w+k−1 share at least one selected
  * fingerprint, so ranking pairs by shared-fingerprint count surfaces
  * plagiarism/mirror/boilerplate relationships that token- or
  * shingle-set Jaccard miss (shared SPANS, not shared vocabulary).
  *
  * Scale shape: documents reduce to fingerprint sets in the scan; the
  * inverted-index join shuffles `(fp, id)` rows only. `maxDf` is the
  * MOSS noise guard AND the quadratic throttle: a fingerprint appearing
  * in more than `maxDf` documents (boilerplate, license headers) is
  * dropped before the self-join, bounding per-key join fan-out at
  * `maxDf²` regardless of corpus size. The pair aggregate is map-side
  * combined; output is top-k bounded. */
object Winnowing {

  /** Top-`k` document pairs by shared winnowed fingerprints:
    * `(id_a, id_b, n_shared, containment)` where containment =
    * n_shared / min(|fps_a|, |fps_b|) at 4 dp; pairs must share at
    * least `minShared` fingerprints; fingerprints in more than `maxDf`
    * docs are dropped (documented recall trade for noise immunity).
    * Ordered by (n_shared desc, id_a, id_b). */
  def sharedFingerprintPairs(df: DataFrame, idCol: String, textCol: String,
                             minShared: Long, maxDf: Long, k: Int): DataFrame = {
    require(minShared >= 1 && maxDf >= 2 && k >= 1,
      s"bad params: $minShared, $maxDf, $k")
    val fps = graft.operators.Spread.widen(df, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        graft.text.TextAnalysis.winnowingFingerprints(col(textCol)).as("fps"))
      .select(col("id"), size(col("fps")).as("nf"), explode(col("fps")).as("fp"))
    // document frequency per fingerprint; the > maxDf tail is boilerplate
    val rare = fps.join(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
        .select(col("fp")),
      "fp")
    val pairs = rare.alias("a")
      .join(rare.alias("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("a.nf")).as("nfa"), first(col("b.nf")).as("nfb"))
      .filter(col("n_shared") >= minShared)
    pairs.select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("nfa"), col("nfb")), 4).as("containment"))
      .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
      .limit(k)
  }
}
