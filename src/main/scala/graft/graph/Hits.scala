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
  *
  * PINNED-LONG walk (the PageRank/PinnedPca convention): scores live on
  * a 1e-9 grid, each `E·x` fold is an exact integer sum, each
  * normalization rounds back to the grid (norms as exact
  * sum-of-squares integers under one sqrt) — identical on any engine
  * and expressible as an unrolled SQL twin.
  */
object Hits {

  private def ra(x: Double): Long =
    if (x >= 0) math.round(x) else -math.round(-x)

  /** Authority scores after `iters` rounds: `(item, authority)` with the
    * authority vector L2-normalized, 6 dp, ordered by item. `edges` rows
    * are (hub, item) pairs; duplicates collapse (0/1 adjacency). */
  def authorities(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize once; consumed 2× per round
    // authority map, driver-held: bounded by the item vocabulary (the
    // KCore/CC "bounded finisher" contract — assert, don't assume)
    var auth: Map[String, Long] = e.select(col("i").cast("string")).distinct()
      .collect().map(r => r.getString(0) -> 1000000000L).toMap
    require(auth.size <= (1 << 17),
      s"authority side too large to broadcast: ${auth.size}")
    for (_ <- 0 until iters) {
      val authLit = typedLit(auth)
      // h = E a (items' grid scores fold onto each hub — EXACT long sum),
      // L2-normalized via one driver-scalar exact sum of squares
      val hRaw = e.withColumn("a9", authLit(col("i").cast("string")))
        .groupBy(col("u")).agg(sum(col("a9")).as("h9raw"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hNorm = math.sqrt(
        hRaw.agg(sum(d38(col("h9raw")) * d38(col("h9raw"))))
          .head().getDecimal(0).doubleValue())
      val hubs = hRaw.select(col("u"),
        round(col("h9raw").cast("double") / lit(hNorm) * lit(1e9))
          .cast("long").as("h9"))
      // a = Eᵀ h — item-bounded, so the collect is the bounded finisher
      val aRaw = e.join(hubs, "u").groupBy(col("i").cast("string").as("i"))
        .agg(sum(col("h9")).as("a9raw")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val aNorm = math.sqrt(
        aRaw.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble)
      auth = aRaw.map { case (k, v) =>
        k -> ra(v.toDouble / aNorm * 1e9) }.toMap
      hRaw.unpersist(blocking = false)
    }
    import spark.implicits._
    e.unpersist(blocking = false)
    auth.toSeq.sortBy(_._1).toDF("item", "a9")
      .select(col("item"),
        round(col("a9").cast("double") / lit(1e9), 6).as("authority"))
  }
}
