package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman-Girvan modularity of a GIVEN node partition:
  * `Q = E_in/m − Σ_c d_c²/(4m²)` — how much more intra-community mass
  * the partition captures than a degree-preserving random rewiring
  * would. Evaluated here for ATTRIBUTE partitions (e.g. "do near-dup
  * edges stay inside one source?"), which keeps every quantity an exact
  * integer aggregate and the whole metric SQL-oracle-able — the
  * community-DETECTION siblings ([[LabelPropagation]]) are fixpoint
  * iterations and spec-gated instead; composing them with this scorer
  * gives detection + honest quality in one pipeline.
  *
  * Scale shape: two broadcast-joins of the (bounded-key) attribute onto
  * the edge endpoints, one m-scalar, one comm-keyed degree rollup —
  * nothing quadratic, no iteration. `Q` is one double expression over
  * exact DECIMAL sums. */
object Modularity {

  /** One row: `(m, n_comm, intra_edges, modularity)` (6 dp). `attrs`
    * maps every node id to its community; edges whose endpoint is
    * missing from `attrs` are dropped (and counted out of m). */
  def attributePartition(edges: DataFrame, srcCol: String, dstCol: String,
                         attrs: DataFrame, idCol: String,
                         commCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d")).distinct()
    val a = attrs.select(col(idCol).cast("long").as("id"),
      col(commCol).as("comm")).distinct()
    // The attrs frame is NODE-sized — corpus-keyed, not a bounded
    // dimension — so the endpoint joins carry NO forced broadcast hint:
    // stats/AQE broadcast it when it fits (it does at test scale) and
    // fall back to a shuffle join when a billion-node map would blow the
    // 8 GB broadcast limit. The tagged frame is consumed by two jobs
    // (the comm-degree rollup's broadcast subtree and the final agg):
    // an eager localCheckpoint materializes the expensive upstream edge
    // derivation exactly ONCE and truncates its lineage — a lazy persist
    // can still double-compute when the broadcast job races the main
    // job past a cold cache (the q288 truncate precedent).
    val tagged = e
      .join(a.select(col("id").as("s"), col("comm").as("cs")), "s")
      .join(a.select(col("id").as("d"), col("comm").as("cd")), "d")
      .localCheckpoint(true)
    val degByComm = tagged
      .select(explode(array(col("cs"), col("cd"))).as("comm"))
      .groupBy(col("comm")).agg(count(lit(1)).as("dc"))
    val dc2 = degByComm.agg(count(lit(1)).as("n_comm"),
      sum(col("dc").cast("decimal(19,0)") * col("dc").cast("decimal(19,0)"))
        .as("sdc2"))
    tagged.agg(count(lit(1)).as("m"),
        sum(when(col("cs") === col("cd"), 1L).otherwise(0L)).as("intra_edges"))
      .crossJoin(broadcast(dc2))
      .select(col("m"), col("n_comm"), col("intra_edges"),
        round(when(col("m") > 0,
          col("intra_edges").cast("double") / col("m").cast("double") -
            col("sdc2").cast("double") /
              (lit(4.0) * col("m").cast("double") * col("m").cast("double"))),
          6).as("modularity"))
  }
}
