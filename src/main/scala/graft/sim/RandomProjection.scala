package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss RANDOM PROJECTION for embedding compression —
  * the cheapest dimension-reduction in the vector-infra toolbox next to
  * PCA (data-dependent), PQ (codebooks) and Matryoshka (training-time):
  * `y = R·x/√k` with `R ∈ {−1,+1}^{k×d}` (Achlioptas 2003's database-
  * friendly signs), preserving pairwise distances within (1±ε) w.h.p.
  * at `k = O(ln n/ε²)` — no training pass, no model state, applicable
  * to a 100 TB corpus in one projection scan.
  *
  * The sign matrix is the portable md5 hash of `(j, d, tag)` — a pure
  * function, so any engine/partition/retry projects identically and the
  * operator is SQL-oracle-able. Projected components are pinned to
  * 9-dp longs; distance arithmetic downstream is exact integer.
  *
  * Scale shape: the projection is one `(id, d, x) × k` fan-out into a
  * map-side-combined `(id, j)` aggregate — n·d·k rows through one
  * shuffle of n·k; nothing driver-side. The [[distortionAudit]] pairs
  * consecutive ids (a deterministic O(n) pair sample, never all pairs). */
object RandomProjection {

  /** ±1 sign for output dim `j`, input dim `d` under `tag`. */
  private def sign(j: Column, d: Column, tag: String): Column =
    when(pmod(graft.operators.Sharding.hash32(
      concat(j.cast("string"), lit(":"), d.cast("string"), lit(":" + tag))),
      lit(2)) === 0, 1L).otherwise(-1L)

  /** `(id, j, y9)` — the k-dim projection, components pinned to 9-dp
    * longs (`y_j = Σ_d s_jd·x_d / √k`). */
  def project(df: DataFrame, idCol: String, vecCol: String,
              k: Int, tag: String): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val xs = df.select(col(idCol).cast("long").as("id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
    // the sign MATRIX is k×d-bounded — hash it once as a broadcast
    // frame instead of per (row, dim, j) term (n·d·k md5 calls → k·d;
    // measured 3.5 s → 2.3 s at sf0.1)
    val spark = df.sparkSession
    val maxD = df.select(max(size(col(vecCol)))).head.getInt(0)
    val dims = spark.range(k).select(col("id").cast("int").as("j"))
    val signs = spark.range(maxD).select(col("id").cast("int").as("d"))
      .crossJoin(dims)
      .select(col("d"), col("j"), sign(col("j"), col("d"), tag).as("s"))
    // per-term 9-dp pin BEFORE the sum: a raw double sum is order-
    // sensitive in the last ulp across partitionings/engines; pinned
    // longs make the fold exact (error ≤ d·5e-10 per component, far
    // inside the 9-dp output grid's intent)
    xs.join(broadcast(signs), Seq("d"))
      .groupBy(col("id"), col("j"))
      .agg(round(sum(round(col("s") * col("x") * lit(1e9))
          .cast("long")).cast("double") / 1e9 /
        lit(math.sqrt(k.toDouble)) * lit(1e9)).cast("long").as("y9"))
  }

  /** One-row distance-preservation audit over consecutive-id pairs:
    * `(n_pairs, mean_ratio, min_ratio, max_ratio)` where ratio =
    * ‖y_a−y_b‖²/‖x_a−x_b‖² (per-pair at 6 dp; zero-distance originals
    * excluded). A healthy JL projection reads mean ≈ 1 with spread
    * shrinking in √k. */
  def distortionAudit(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, tag: String): DataFrame = {
    // the projection is SELF-JOINED below — materialize the n·k-row
    // result once instead of re-running the n·d·k fan-out per side
    // (4.0 s → 2.6 s at sf0.1)
    val proj = project(df, idCol, vecCol, k, tag).localCheckpoint(true)
    def d38(c: Column) = c.cast("decimal(38,0)")
    // projected squared distance: exact integer over the pinned components
    val dproj = proj.alias("a")
      .join(proj.select((col("id") - 1L).as("id"), col("j"),
        col("y9").as("b9")).alias("b"), Seq("id", "j"))
      .groupBy(col("id"))
      .agg(sum(d38(col("y9") - col("b9")) * d38(col("y9") - col("b9")))
        .as("dy2"))
    // original squared distance: per-dim terms pinned to 9-dp longs so
    // the sum is order-free. Computed IN-ROW (zip_with + aggregate over
    // the two arrays after one id-keyed self-join) — the exploded
    // (id, d)-keyed formulation paid an n·d-row shuffle and a groupBy
    // for the same exact long sum. Arrays are fixed-dim by the
    // embeddings contract (ragged inputs would null-pad here where the
    // explode-join intersected dims).
    val va = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("xs"))
    val dorig = va.alias("a")
      .join(va.select((col("id") - 1L).as("id"), col("xs").as("bxs"))
        .alias("b"), Seq("id"))
      .select(col("id"),
        aggregate(
          zip_with(col("xs"), col("bxs"),
            (x, bx) => round((x - bx) * (x - bx) * lit(1e9)).cast("long")),
          lit(0L), (acc, t) => acc + t).as("dx2_9"))
    val ratios = dproj.join(dorig, "id")
      .filter(col("dx2_9") > 0)
      .select(round((col("dy2").cast("double") / 1e18) /
        (col("dx2_9").cast("double") / 1e9) * lit(1e6)).cast("long").as("r6"))
    ratios.agg(count(lit(1)).as("n_pairs"),
      round(avg(col("r6")) / 1e6, 6).as("mean_ratio"),
      round(min(col("r6")).cast("double") / 1e6, 6).as("min_ratio"),
      round(max(col("r6")).cast("double") / 1e6, 6).as("max_ratio"))
  }
}
