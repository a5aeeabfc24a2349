package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou 2011): split each d-dim vector into `m`
  * subvectors, learn a tiny k-means codebook per subspace, and represent
  * every vector as `m` byte-sized codes — the memory layer of
  * billion-scale ANN (a 64-dim float vector becomes 8 bytes at m=8,
  * k=16), sitting beside the precision axis ([[Quantize]] int8) and the
  * dimension axis ([[Matryoshka]]).
  *
  * Training is Lloyd's with the same determinism conventions as
  * [[Similarity.kmeansAssign]]: init = the first k vectors by id per
  * subspace, assignments by a broadcast-codebook UDF, ALL subspaces
  * updated in ONE distributed pass per iteration (the corpus never
  * iterates per-subspace). Codebooks are m·k·(d/m) doubles — kilobytes
  * broadcast, never shuffled.
  *
  * Float-sum order in the centroid means is partition-dependent, so PQ
  * reports are rows-only (spec pins structure: MSE monotone in k,
  * rerun-identical, encode/decode shape).
  */
object ProductQuantize {

  final case class Codebook(m: Int, subDim: Int,
                            cents: Array[Array[Array[Double]]])

  /** Train per-subspace codebooks. `m` must divide the vector width. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, iters: Int = 5): Codebook = {
    require(m >= 1 && k >= 1 && iters >= 1, s"bad params m=$m k=$k iters=$iters")
    val data = df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val width = data.select(size(col("v"))).head().getInt(0)
    require(width % m == 0, s"m=$m must divide vector width $width")
    val subDim = width / m
    // deterministic init: first k vectors by id seed every subspace
    val seed = data.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m, k) {
      (s, c) => seed(math.min(c, seed.length - 1))
        .slice(s * subDim, (s + 1) * subDim)
    }
    val spark = df.sparkSession
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assign = udf { (v: Seq[Double]) =>
        val cs = bc.value
        (0 until cs.length).map { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs(s).length) {
            var d2 = 0.0; var i = 0
            while (i < cs(s)(c).length) {
              val d = v(s * cs(s)(c).length + i) - cs(s)(c)(i)
              d2 += d * d; i += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          best
        }
      }
      // ONE pass updates all m subspaces: explode (sub, code, subvec)
      val assigned = data.withColumn("codes", assign(col("v")))
      val sums = assigned
        .select(posexplode(col("codes")).as(Seq("sub", "code")), col("v"))
        .select(col("sub"), col("code"),
          expr("slice(v, sub * " + subDim + " + 1, " + subDim + ")").as("sv"))
        .groupBy(col("sub"), col("code"))
        .agg(count(lit(1)).as("n"),
          array((0 until subDim).map(i =>
            sum(element_at(col("sv"), i + 1))): _*).as("s"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      sums.foreach { r =>
        val s = r.getInt(0); val c = r.getInt(1)
        val n = r.getLong(2).toDouble
        val sv = r.getSeq[Double](3).toArray
        next(s)(c) = sv.map(_ / n)
      }
      cents = next
      bc.destroy()
    }
    data.unpersist(blocking = false)
    Codebook(m, subDim, cents)
  }

  /** `(id, codes)` — the m-byte representation. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val enc = udf { (v: Seq[Double]) =>
      val b = bc.value
      (0 until b.m).map { s =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < b.cents(s).length) {
          var d2 = 0.0; var i = 0
          while (i < b.subDim) {
            val d = v(s * b.subDim + i) - b.cents(s)(c)(i)
            d2 += d * d; i += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        best
      }
    }
    df.select(col(idCol).as("id"),
      enc(col(vecCol).cast("array<double>")).as("codes"))
  }

  /** Per-subspace reconstruction MSE report: `(sub, mse)` (6 dp). */
  def mseReport(df: DataFrame, idCol: String, vecCol: String,
                cb: Codebook): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val errs = udf { (v: Seq[Double]) =>
      val b = bc.value
      (0 until b.m).map { s =>
        var best = Double.MaxValue
        var c = 0
        while (c < b.cents(s).length) {
          var d2 = 0.0; var i = 0
          while (i < b.subDim) {
            val d = v(s * b.subDim + i) - b.cents(s)(c)(i)
            d2 += d * d; i += 1
          }
          if (d2 < best) best = d2
          c += 1
        }
        best / b.subDim
      }
    }
    df.select(errs(col(vecCol).cast("array<double>")).as("e"))
      .select(posexplode(col("e")).as(Seq("sub", "err")))
      .groupBy(col("sub"))
      .agg(round(avg(col("err")), 6).as("mse"))
      .orderBy(col("sub"))
  }

  // ------------------------------------------------------------ pinned

  /** PINNED-integer PQ training — the [[Similarity.kmeansAssign]]
    * discipline applied per subspace so the whole Lloyd recurrence is an
    * exact integer computation (vectors on the 1e-6 grid, centroids =
    * `round(sum/count)` back onto the grid, squared distances as exact
    * longs, argmin ties to the lowest code) and therefore reproducible
    * as unrolled ANSI SQL on any engine. Each iteration is ONE
    * single-stage `treeAggregate` job: per-partition `m×k×subDim` long
    * sums + `m×k` counts merge on the driver — no shuffle, and the only
    * driver state is the codebook grid (kilobytes at any corpus size).
    * The float [[train]] above stays the library default fast path. */
  def trainPinned(df: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int, iters: Int = 5): Array[Array[Array[Long]]] = {
    require(m >= 1 && k >= 1 && iters >= 1, s"bad params m=$m k=$k iters=$iters")
    val spark = df.sparkSession
    import spark.implicits._
    def raL(x: Double): Long = if (x >= 0) math.round(x) else -math.round(-x)
    val data = df.select(col(idCol).as("id"),
        transform(col(vecCol).cast("array<double>"),
          x => round(x * lit(1e6)).cast("long")).as("v6"))
      .filter(col("v6").isNotNull && size(col("v6")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = data.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    require(seed.nonEmpty, "trainPinned needs at least one vector")
    val dims = seed.map(_.length).distinct
    require(dims.length == 1 && dims.head % m == 0,
      s"need a fixed vector width divisible by m=$m; seed widths ${dims.mkString(",")}")
    val width = dims.head
    val subDim = width / m
    var cents: Array[Array[Array[Long]]] = Array.tabulate(m, k) { (s, c) =>
      seed(math.min(c, seed.length - 1)).slice(s * subDim, (s + 1) * subDim)
    }
    // the seqOp indexes v(s*subDim+i) — on a ragged corpus a short
    // non-seed row would throw in the executor and a long one silently
    // drops its tail dims; pin the training set to the seed width (the
    // pinnedLloyd contract) so the recurrence sees fixed-width rows only
    val ds = data.filter(size(col("v6")) === width).select(col("v6")).as[Array[Long]]
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val (sums, counts) = ds.rdd.treeAggregate(
        (Array.fill(m, k, subDim)(0L), Array.fill(m, k)(0L)))(
        seqOp = { case ((sm, ct), v) =>
          var s = 0
          while (s < m) {
            val sc = bc.value(s)
            var best = 0; var bestD = Long.MaxValue; var c = 0
            while (c < sc.length) {
              var d2 = 0L; var i = 0
              while (i < subDim) {
                val d = v(s * subDim + i) - sc(c)(i); d2 += d * d; i += 1
              }
              if (d2 < bestD) { bestD = d2; best = c }
              c += 1
            }
            val row = sm(s)(best); var i = 0
            while (i < subDim) { row(i) += v(s * subDim + i); i += 1 }
            ct(s)(best) += 1L
            s += 1
          }
          (sm, ct)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var s = 0
          while (s < m) {
            var c = 0
            while (c < k) {
              var i = 0
              while (i < subDim) { s1(s)(c)(i) += s2(s)(c)(i); i += 1 }
              c1(s)(c) += c2(s)(c)
              c += 1
            }
            s += 1
          }
          (s1, c1)
        })
      bc.destroy()
      cents = Array.tabulate(m, k) { (s, c) =>
        if (counts(s)(c) > 0)
          Array.tabulate(subDim)(i => raL(sums(s)(c)(i).toDouble / counts(s)(c)))
        else cents(s)(c)
      }
    }
    data.unpersist(blocking = false)
    cents
  }

  /** Per-subspace reconstruction MSE under a pinned codebook — `(sub,
    * mse)` at 6 dp, fully deterministic: the per-row error is the EXACT
    * integer min squared distance on the 1e-6 grid, summed exactly
    * (decimal(38)), divided back once at the end — no float-sum-order
    * dependence, so the readout is DuckDB-oracle-able. The codebook
    * ships as one `m×k×subDim` literal through codegen'd higher-order
    * functions (no UDF). */
  def msePinnedReport(df: DataFrame, idCol: String, vecCol: String,
                      cents: Array[Array[Array[Long]]]): DataFrame = {
    val m = cents.length
    require(m >= 1 && cents(0).nonEmpty && cents(0)(0).nonEmpty, "empty codebook")
    val subDim = cents(0)(0).length
    val centLit = typedlit(cents.map(_.map(_.toSeq).toSeq).toSeq)
    val v6 = transform(col(vecCol).cast("array<double>"),
      x => round(x * lit(1e6)).cast("long"))
    df.select(v6.as("v6"))
      // exact-width rows only — slice() on a short vector yields a
      // truncated subvector and a silently wrong zip_with distance
      .filter(col("v6").isNotNull && size(col("v6")) === m * subDim)
      .select(col("v6"), explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("sub"),
        slice(col("v6"), col("sub") * subDim + 1, lit(subDim)).as("sv6"))
      .select(col("sub"),
        array_min(transform(element_at(centLit, col("sub") + 1),
          cv => aggregate(zip_with(col("sv6"), cv, (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x))).as("d2"))
      .groupBy(col("sub"))
      .agg(round(sum(col("d2").cast("decimal(38,0)")).cast("double")
        / count(lit(1)) / lit(1e12) / lit(subDim.toDouble), 6).as("mse"))
      .orderBy(col("sub"))
  }
}
