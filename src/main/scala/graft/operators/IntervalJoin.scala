package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap equi-join: pairs of intervals `[aStart,aEnd]` ×
  * `[bStart,bEnd]` with `aStart ≤ bEnd ∧ bStart ≤ aEnd` — the
  * two-sided generalization of [[RangeJoin]]'s point-in-interval
  * (calendar overlap, downtime × activity, shift × incident).
  *
  * A naive theta join is a broadcast-nested-loop cartesian — O(|A|·|B|)
  * and a non-starter at scale. This is the standard BUCKETIZATION
  * rewrite: each interval replicates to the fixed-width time buckets it
  * covers, candidates meet through a bucket EQUI-join (hash-shuffled,
  * AQE-planned), the exact predicate filters false positives inside the
  * bucket, and each true pair survives exactly once via the FIRST-BUCKET
  * rule — it is emitted only in the bucket containing
  * `max(aStart, bStart)`, so no distinct pass is needed.
  *
  * Cost: replication factor = interval span / bucket width (pick the
  * bucket near the median span); everything else is one equi-join.
  * Degenerate giant intervals replicate widely — split those out and
  * broadcast them (they are few by definition) if a profile shows it.
  */
object IntervalJoin {

  /** Overlap pairs of `a` × `b` (epoch-seconds long columns), all columns
    * of both sides preserved. `bucketSeconds` is the bucketization width. */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String,
                  bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket",
        explode(sequence(
          floor(col(s) / bucketSeconds).cast("long"),
          floor(col(e) / bucketSeconds).cast("long"))))
    buckets(a, aStart, aEnd)
      .join(buckets(b, bStart, bEnd), Seq("__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // first-bucket rule: exactly-once without a distinct
      .filter(col("__bucket") ===
        floor(greatest(col(aStart), col(bStart)) / bucketSeconds).cast("long"))
      .drop("__bucket")
  }

  /** [[overlapJoin]] with the bucket width chosen FROM THE DATA: the
    * median span of both sides (GK sketch — one cheap pass), clamped to
    * ≥ 1 s. Median, not mean: one giant outlier interval must not widen
    * every bucket (it only widens its own replication). */
  def overlapJoinAuto(a: DataFrame, b: DataFrame,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String): DataFrame = {
    val spans = a.select((col(aEnd) - col(aStart)).cast("double").as("s"))
      .unionAll(b.select((col(bEnd) - col(bStart)).cast("double").as("s")))
    val med = spans.stat.approxQuantile("s", Array(0.5), 0.01).head
    overlapJoin(a, b, aStart, aEnd, bStart, bEnd,
      math.max(1L, math.round(med)))
  }
}
