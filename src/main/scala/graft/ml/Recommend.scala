package graft.ml

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS matrix factorization (Hu-Koren-Volinsky implicit-feedback
  * formulation via `spark.ml`) — the LATENT-factor rung of the recsys
  * family: where [[graft.sim.ItemSimilarity]] scores items by observed
  * co-occurrence, ALS embeds users and items so items never bought
  * together can still be near (shared buyer taste), the classic
  * generalization co-counts cannot make.
  *
  * Spark-first: `spark.ml`'s blocked ALS IS the idiomatic distributed
  * factorizer (the in-box implementation of the alternating
  * least-squares normal equations over user/item blocks); the library
  * adds the deterministic readout on top — an item-neighbor ranking by
  * latent cosine against a pinned anchor (the minimum item id), ties
  * broken by id, similarities at 4 dp.
  *
  * Determinism: seed pinned; ALS factor init is seeded per block, so
  * results are stable for a fixed environment/partitioning (the spec
  * asserts same-session reproducibility; cross-engine equality is out
  * of scope — this is a no-oracle, rows-checked operator by design).
  *
  * Scale shape: the ratings fold is one corpus aggregate; ALS itself is
  * the well-studied blocked implementation; the readout broadcasts ONE
  * anchor vector over the item-bounded factor frame. */
object Recommend {

  /** Top-`k` latent neighbors of the smallest item id:
    * `(item, sim)` by cosine of ALS item factors, ordered (sim desc,
    * item). `ratings` columns: `user`, `item`, `rating`. */
  def alsItemNeighbors(ratings: DataFrame, rank: Int, maxIter: Int,
                       regParam: Double, k: Int): DataFrame = {
    require(rank >= 2 && maxIter >= 1 && k >= 1,
      s"bad params: $rank, $maxIter, $k")
    val als = new ALS()
      .setSeed(42L)
      .setRank(rank)
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setImplicitPrefs(true)
      .setUserCol("user")
      .setItemCol("item")
      .setRatingCol("rating")
    val model = als.fit(ratings)
    model.itemFactors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchorId = model.itemFactors.agg(min(col("id"))).collect()(0).getInt(0)
    val anchorVec = model.itemFactors.where(col("id") === anchorId)
      .select(col("features")).collect()(0).getSeq[Float](0).toArray
    val bc = ratings.sparkSession.sparkContext.broadcast(anchorVec)
    val sim = udf((v: Seq[Float]) => {
      val a = bc.value
      var dot = 0.0; var na = 0.0; var nv = 0.0
      var i = 0
      while (i < math.min(a.length, v.length)) {
        dot += a(i).toDouble * v(i); na += a(i).toDouble * a(i); nv += v(i).toDouble * v(i)
        i += 1
      }
      if (na > 0 && nv > 0) dot / (math.sqrt(na) * math.sqrt(nv)) else 0.0
    })
    model.itemFactors
      .where(col("id") =!= anchorId)
      .select(col("id").cast("long").as("item"), sim(col("features")).as("__s"))
      .orderBy(col("__s").desc, col("item"))
      .limit(k)
      .select(col("item"), round(col("__s"), 4).as("sim"))
  }
}
