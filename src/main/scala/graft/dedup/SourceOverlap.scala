package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source CONTENT OVERLAP matrix: for every pair of sources, how
  * much exact-duplicate content they share — the corpus-composition
  * check run before mixing sources into a training set (a source that
  * is largely a re-crawl of another inflates its mixture weight and
  * leaks eval data across source-level splits; the licensing/provenance
  * audit asks the same question).
  *
  * `jaccard = |Aᵈ ∩ Bᵈ| / |Aᵈ ∪ Bᵈ|` over the sets of DISTINCT content
  * digests per source — document multiplicity inside one source does
  * not change its overlap with another.
  *
  * Scale shape: the corpus collapses to distinct `(source, digest)`
  * rows in one hash aggregate (the only corpus-sized shuffle — and it
  * carries digests, never text); the pair matrix is a digest-keyed
  * self-join of THAT frame, output bounded by |sources|². A digest
  * shared by s sources expands to s² rows — bounded by the source
  * count, not the corpus. Null text (no digest) joins nothing and is
  * excluded from the per-source universe, mirroring every digest-path
  * operator here. */
object SourceOverlap {

  /** `(source_a, source_b, shared, n_a, n_b, jaccard)` for every source
    * pair with `shared > 0`, `source_a < source_b`; jaccard to 4 dp. */
  def overlapMatrix(docs: DataFrame, sourceCol: String,
                    textCol: String): DataFrame = {
    val d = docs
      .select(col(sourceCol).cast("string").as("src"),
        md5(col(textCol)).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = d.groupBy(col("src")).agg(count(lit(1)).as("n"))
      val shared = d.toDF("source_a", "h")
        .join(d.toDF("source_b", "h"), "h")
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(broadcast(sizes.toDF("source_a", "n_a")), "source_a")
        .join(broadcast(sizes.toDF("source_b", "n_b")), "source_b")
        .select(col("source_a"), col("source_b"), col("shared"),
          col("n_a"), col("n_b"),
          round(col("shared").cast("double") /
            (col("n_a") + col("n_b") - col("shared")), 4).as("jaccard"))
        .localCheckpoint(eager = true)
    } finally d.unpersist(blocking = false)
  }
}
