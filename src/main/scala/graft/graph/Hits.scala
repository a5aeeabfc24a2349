package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) on a DIRECTED (typically
  * bipartite) edge set — the "mutual reinforcement" ranking:
  * an authority is good if good hubs point at it, a hub is good if it
  * points at good authorities. On the user→item event graph this scores
  * items by the attention of broadly-active users (where plain counts
  * score them by raw traffic) — the engagement-quality companion to
  * [[PageRank]].
  *
  * Power iteration on the co-citation operator: `a ← Eᵀh`, `h ← Ea`,
  * each L2-normalized. Converges to the principal eigenvectors of
  * `EᵀE` / `EEᵀ`.
  *
  * Scale shape per round: authorities come from one dst-keyed aggregate
  * over the edge frame; the (small, bounded) authority frame is
  * BROADCAST back for the hub update — the edge corpus shuffles on its
  * src key once per round and nothing else is corpus-sized. The L2 norm
  * is a DRIVER SCALAR per round (one-row aggregate — the PageRank
  * dangling-mass pattern; a crossJoin(broadcast) would serialize an AQE
  * wave into every stage). Hub scores stay distributed throughout; only
  * the authority vector (bounded by the item vocabulary) is collected.
  * Like the other fixpoint operators (PageRank/KCore/LPA), results are
  * iterated floats — spec-pinned, not SQL-oracled.
  */
object Hits {

  /** Authority scores after `iters` rounds: `(item, authority)` with the
    * authority vector L2-normalized, 6 dp, ordered by item. `edges` rows
    * are (hub, item) pairs; duplicates collapse (0/1 adjacency). */
  def authorities(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize once; consumed 2× per round
    // authority map, driver-held: bounded by the item vocabulary (the
    // KCore/CC "bounded finisher" contract — assert, don't assume)
    var auth: Map[Any, Double] = e.select(col("i")).distinct().collect()
      .map(r => r.get(0) -> 1.0).toMap
    require(auth.size <= (1 << 17),
      s"authority side too large to broadcast: ${auth.size}")
    var hubs: DataFrame = null
    for (_ <- 0 until iters) {
      val authLit = typedLit(auth.map { case (k, v) => k.toString -> v })
      // h = E a (items' scores fold onto each hub), then L2-normalize
      // via one driver-scalar aggregate
      val hRaw = e.withColumn("a", authLit(col("i").cast("string")))
        .groupBy(col("u")).agg(sum(col("a")).as("h"))
      val hNorm = math.sqrt(
        hRaw.agg(sum(col("h") * col("h"))).head().getDouble(0))
      hubs = hRaw.withColumn("h", col("h") / lit(hNorm))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // a = Eᵀ h, normalized the same way — the aggregate output is
      // item-bounded, so the collect is the bounded finisher again
      val aRaw = e.join(hubs, "u").groupBy(col("i"))
        .agg(sum(col("h")).as("a")).collect()
        .map(r => r.get(0) -> r.getDouble(1))
      val aNorm = math.sqrt(aRaw.map(x => x._2 * x._2).sum)
      auth = aRaw.map { case (k, v) => k -> v / aNorm }.toMap
      hubs.unpersist(blocking = false)
    }
    import spark.implicits._
    auth.toSeq.map { case (k, v) =>
      (k.toString, math.rint(v * 1e6) / 1e6)
    }.sortBy(_._1).toDF("item", "authority")
  }
}
