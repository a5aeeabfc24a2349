package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection over an embedding column (Gonzalez
  * 1985 farthest-point traversal — a 2-approximation of the optimal
  * k-center cover): the diversity-maximizing curation step that picks
  * `k` mutually-far exemplars, the complement of SemDeDup's
  * redundancy-removal (q73) — that trims what's too close, this keeps
  * what spans the space.
  *
  * Distributed shape: the corpus never moves — each round broadcasts ONE
  * center vector (as a literal in the projection), updates every point's
  * min-distance-to-selected in a map, and takes a single (max, argmax)
  * aggregate; k rounds = k scans of a persisted (id, vec, dist) frame.
  * The accumulated `least(...)` lineage is re-planned per round but the
  * frame below it stays cached, so total work is O(k²·n·dim/2) flops —
  * the accepted cost of exact greedy traversal (a localCheckpoint per
  * round would make it O(k·n·dim) at the price of k materializations;
  * at k ≲ 64 the quadratic term is cheaper).
  *
  * Determinism: squared-Euclidean per-row sums evaluate in fixed
  * element order; the argmax tiebreak is (distance, lowest id) via a
  * single max(struct) — no float cross-row accumulation anywhere.
  * Seed = lowest id (pinned, not random): reproducible on any engine.
  */
object KCenter {

  /** Selected exemplars `(step, id, radius)` in selection order, where
    * `radius` is the point's distance to the nearest PREVIOUS center at
    * the moment it was chosen (the classic non-increasing coverage-
    * radius diagnostic; the seed reports NULL). */
  def greedy(df: DataFrame, idCol: String, vecCol: String,
             k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sqDist(c: Seq[Double]): Column = {
      val litVec = array(c.map(lit): _*)
      expr2(litVec)
    }
    def expr2(litVec: Column): Column =
      aggregate(zip_with(col("v"), litVec, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
    // seed: lowest id
    val seedRow = base.orderBy(col("id")).limit(1)
      .select(col("id"), col("v")).head
    var picked = List((1, seedRow.getLong(0), Option.empty[Double]))
    var curVec = seedRow.getSeq[Double](1)
    var dist: Column = sqDist(curVec)
    for (step <- 2 to k) {
      // argmax of current min-distance, tiebreak lowest id — the winner's
      // VECTOR rides inside the same max(struct) aggregate, so each round
      // is exactly one job (no separate point-lookup scan)
      val far = base.agg(max(struct(dist.as("d"), (-col("id")).as("ni"),
          col("v").as("fv"))))
        .head.getStruct(0)
      val fid = -far.getLong(1)
      val fd = far.getDouble(0)
      val fvec = far.getSeq[Double](2)
      picked = (step, fid, Some(math.sqrt(fd))) :: picked
      dist = least(dist, sqDist(fvec))
      curVec = fvec
    }
    base.unpersist(blocking = false)
    picked.reverse
      .map { case (s, i, r) => (s, i, r.map(x => math.rint(x * 1e6) / 1e6)) }
      .toDF("step", "id", "radius")
  }
}
