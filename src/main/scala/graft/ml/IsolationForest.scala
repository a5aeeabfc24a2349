package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** L9 — Isolation Forest anomaly detection (Liu, Ting, Zhou, ICDM 2008),
  * absent from spark.ml (SURVEY.md §4.3).
  *
  * Faithful-to-paper design under Spark's execution model:
  *  - each tree is grown from a SMALL uniform subsample (ψ = 256 by
  *    default, as in the paper) — the subsample is the only data that
  *    touches the driver;
  *  - the fitted ensemble (t trees × ≤2ψ nodes) is broadcast and SCORING
  *    is fully distributed, per-row, shuffle-free;
  *  - anomaly score s(x) = 2^(−E[h(x)]/c(ψ)); the reference's
  *    `contamination=0.1` decision (`process_logs_v9.py:424-439`) maps to
  *    flagging the top `contamination` quantile, and its −1→1 label remap
  *    (P12) is applied in [[fitPredict]].
  */
object IsolationForest {

  private case class Node(splitFeature: Int, splitValue: Double,
                          left: Int, right: Int, size: Int)

  /** Average unsuccessful-search path length in a BST of n nodes. */
  private def c(n: Double): Double =
    if (n <= 1.0) 0.0 else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  private def growTree(data: Array[Array[Double]], rnd: Random, maxDepth: Int): Array[Node] = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    def grow(idx: Array[Int], depth: Int): Int = {
      val id = nodes.length
      nodes += Node(-1, 0.0, -1, -1, idx.length) // placeholder
      if (depth >= maxDepth || idx.length <= 1) return id
      val nFeat = data(0).length
      // pick a feature with spread; give up after a few tries
      var tries = 0
      var feat = -1; var lo = 0.0; var hi = 0.0
      while (tries < 8 && feat < 0) {
        val f = rnd.nextInt(nFeat)
        var mn = Double.MaxValue; var mx = Double.MinValue
        idx.foreach { i => val v = data(i)(f); if (v < mn) mn = v; if (v > mx) mx = v }
        if (mx > mn) { feat = f; lo = mn; hi = mx }
        tries += 1
      }
      if (feat < 0) return id
      val split = lo + rnd.nextDouble() * (hi - lo)
      val (li, ri) = idx.partition(i => data(i)(feat) < split)
      if (li.isEmpty || ri.isEmpty) return id
      val l = grow(li, depth + 1)
      val r = grow(ri, depth + 1)
      nodes(id) = Node(feat, split, l, r, idx.length)
      id
    }
    grow(data.indices.toArray, 0)
    nodes.toArray
  }

  /** The whole ensemble flattened into primitive parallel arrays (node
    * ids tree-local, trees located by `offsets`): the scoring hot loop is
    * ~rows × trees × depth node hops, and an Array[Node] walk chases one
    * object pointer per hop — the flat layout keeps it in primitive
    * cache lines and off the GC. `leafC` pre-computes c(size) per node so
    * leaves cost no log/divide at score time. */
  private final class FlatForest(trees: Array[Array[Node]]) extends Serializable {
    val offsets: Array[Int] = trees.scanLeft(0)(_ + _.length)
    private val total = offsets.last
    val feat = new Array[Int](total)
    val split = new Array[Double](total)
    val left = new Array[Int](total)
    val right = new Array[Int](total)
    val leafC = new Array[Double](total)
    for (t <- trees.indices; i <- trees(t).indices) {
      val n = trees(t)(i); val j = offsets(t) + i
      feat(j) = n.splitFeature; split(j) = n.splitValue
      left(j) = n.left; right(j) = n.right
      leafC(j) = c(n.size.toDouble)
    }
    val nTrees: Int = trees.length

    def avgPathLength(x: Array[Double]): Double = {
      var sum = 0.0
      var t = 0
      while (t < nTrees) {
        val base = offsets(t)
        var node = base
        var depth = 0.0
        while (feat(node) >= 0) {
          node = base + (if (x(feat(node)) < split(node)) left(node) else right(node))
          depth += 1.0
        }
        sum += depth + leafC(node)
        t += 1
      }
      sum / nTrees
    }
  }

  /** Score each row in [0,1] (higher = more anomalous) and flag the top
    * `contamination` quantile as anomalies (`is_anomaly` = 1, else 0 —
    * the reference's remapped labels). Adds `anomaly_score`. */
  def fitPredict(df: DataFrame, featureCols: Seq[String],
                 numTrees: Int = 100, sampleSize: Int = 256,
                 contamination: Double = 0.1, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    // ONE zero-column pass gives both the row count and the EFFECTIVE
    // scan parallelism. `rdd.getNumPartitions` lies for a
    // single-row-group parquet file: FilePartition math slices it into
    // ~defaultParallelism byte ranges, but only the slice containing
    // the row-group start emits rows — so the partition COUNT looks
    // wide while every row lands in one task (measured: the whole
    // rows × trees × depth ensemble walk pinned to one core, 6.5 s of
    // single-thread CPU at sf0.1 while 31 cores idled).
    val partCounts = df.select(lit(1)).rdd
      .mapPartitions({ it =>
        // Long fold, NOT Iterator.size: size returns Int and would wrap
        // on a >2^31-row partition — exactly the single-hot-partition
        // pathology this probe exists to detect
        var c = 0L
        while (it.hasNext) { it.next(); c += 1L }
        Iterator(c)
      }, preservesPartitioning = true)
      .collect()
    val n = partCounts.sum
    val psi = math.min(sampleSize.toLong, n).toInt
    val maxDepth = math.ceil(math.log(math.max(psi, 2)) / math.log(2)).toInt
    // ψ·numTrees rows at most reach the driver — bounded, independent of n.
    val rnd = new Random(seed)
    val pool = df.select(featureCols.map(c => col(c).cast("double")): _*)
      .sample(withReplacement = false, math.min(1.0, (psi.toDouble * numTrees * 1.2) / math.max(n, 1)), seed)
      .collect().map(r => featureCols.indices.map(i => r.getDouble(i)).toArray)
    val trees = (0 until numTrees).map { _ =>
      val sub = Array.fill(math.min(psi, math.max(pool.length, 1)))(pool(rnd.nextInt(math.max(pool.length, 1))))
      growTree(sub, rnd, maxDepth)
    }.toArray
    val cPsi = c(psi.toDouble)
    val flat = new FlatForest(trees)
    val bc = spark.sparkContext.broadcast(flat)
    val scoreUdf = udf { (xs: Seq[Double]) =>
      val arr = xs.toArray // unbox once; per-node Seq indexing dominates otherwise
      math.pow(2.0, -bc.value.avgPathLength(arr) / math.max(cPsi, 1e-9))
    }
    // Scoring is CPU-dense (rows × trees × depth hops): decouple compute
    // parallelism from scan splits — a single-row-group parquet file (or
    // any unsplittable input) would otherwise pin the whole ensemble walk
    // to one core. The check uses the EFFECTIVE (non-empty) partition
    // count from the probe pass above, never `getNumPartitions` (see its
    // comment); one cheap round-robin shuffle restores parallelism, and
    // an input that is already effectively wide (the 100 TB case) passes
    // through untouched.
    val target = spark.sparkContext.defaultParallelism
    val effective = partCounts.count(_ > 0L)
    val base = if (effective < target) df.repartition(target) else df
    val scored = base.withColumn("anomaly_score",
      scoreUdf(array(featureCols.map(c => col(c).cast("double")): _*)))
    // Cutoff from the ALREADY-COLLECTED driver pool, scored locally: the
    // contamination quantile is approximate by contract, the pool is a
    // uniform sample of the same distribution, and scoring it on the
    // driver (≤ ψ·t·1.2 rows × t trees) is milliseconds — so the cluster
    // runs EXACTLY ONE scoring pass and zero extra jobs. (A distributed
    // quantile pass would either re-run ensemble scoring over the data —
    // the plan is lazy — or force caching the full scored table, which is
    // wrong at 100 TB.)
    val poolScores = pool.map(x =>
      math.pow(2.0, -flat.avgPathLength(x) / math.max(cPsi, 1e-9))).sorted
    val cutoff =
      if (poolScores.isEmpty) Double.MaxValue
      else poolScores(math.min(poolScores.length - 1,
        math.floor((1.0 - contamination) * poolScores.length).toInt))
    scored.withColumn("is_anomaly", when(col("anomaly_score") >= cutoff, 1).otherwise(0))
  }
}
