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
}
