package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matrix-profile discord detection over per-group daily series (Yeh et
  * al. 2016, the exact all-pairs formulation): the subsequence whose
  * NEAREST neighbor is farthest is the series' most anomalous window —
  * a shape anomaly the pointwise z-score ops (rolling z, CUSUM) cannot
  * see, because every individual point can be unremarkable while the
  * 7-day SHAPE is unprecedented.
  *
  * Engine: windows of length w are built by a bounded day×offset
  * explode (w rows per day), per-window moments and all-pairs dot
  * products are exact integer sums off the 6-dp-quantized series, and
  * the z-normalized distance
  * `d²(i,j) = 2w·(1 − (S_ij − w·μ_iμ_j)/(w·σ_iσ_j))` is one double
  * expression per pair. Trivial matches are excluded by the standard
  * |i−j| ≥ w exclusion zone. The pair frame is span²-bounded per group
  * (documented: the day grid, never the corpus, scales it — the same
  * bound as Theil-Sen's pairwise slopes).
  *
  * Output per group: `(group, n_windows, discord_start, discord_d2)` —
  * the discord's start day index and its nearest-neighbor z-distance²
  * at 4 dp (ties → smallest start). */
object MatrixProfile {

  def discord(df: DataFrame, groupCol: String, tsCol: String,
              valueCol: String, w: Int = 7): DataFrame = {
    require(w >= 2, s"need w >= 2: $w")
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * lit(1000000)).cast("long")).as("vq"))
    val wg = Window.partitionBy(col("g"))
    val idx = daily
      .withColumn("di", datediff(col("day"), min(col("day")).over(wg)))
      .select(col("g"), col("di"), col("vq"))
    // window membership: day di belongs to windows i = di-w+1 .. di at
    // offset k = di - i; keep only complete windows (count = w)
    val memb = idx
      .withColumn("k", explode(sequence(lit(0), lit(w - 1))))
      .select(col("g"), (col("di") - col("k")).as("i"), col("k"),
        col("vq"))
      .filter(col("i") >= 0)
    def d38(c: Column) = c.cast("decimal(38,0)")
    val stats = memb.groupBy(col("g"), col("i"))
      .agg(count(lit(1)).as("m"), sum(d38(col("vq"))).as("sw"),
        sum(d38(col("vq")) * d38(col("vq"))).as("sww"))
      .filter(col("m") === w)
    val full = memb.join(stats.select(col("g"), col("i")), Seq("g", "i"))
    // all-pairs aligned dot products: join window elements on (g, k)
    val a = full.select(col("g"), col("i").as("ia"), col("k"),
      col("vq").as("va"))
    val b = full.select(col("g"), col("i").as("ib"), col("k"),
      col("vq").as("vb"))
    val dots = a.join(b, Seq("g", "k"))
      .filter(abs(col("ia") - col("ib")) >= w)
      .groupBy(col("g"), col("ia"), col("ib"))
      .agg(sum(d38(col("va")) * d38(col("vb"))).as("sab"))
    val sa = stats.select(col("g"), col("i").as("ia"),
      col("sw").as("swa"), col("sww").as("swwa"))
    val sb = stats.select(col("g"), col("i").as("ib"),
      col("sw").as("swb"), col("sww").as("swwb"))
    val d2 = dots.join(sa, Seq("g", "ia")).join(sb, Seq("g", "ib"))
      .select(col("g"), col("ia"), {
        val wd = lit(w.toDouble)
        def mu(s: Column) = s.cast("double") / wd
        def v(ss: Column, s: Column) =
          ss.cast("double") / wd - mu(s) * mu(s)
        val va = v(col("swwa"), col("swa"))
        val vb = v(col("swwb"), col("swb"))
        val rho = (col("sab").cast("double") / wd -
          mu(col("swa")) * mu(col("swb"))) / sqrt(va * vb)
        // flat (zero-variance) windows carry no shape — null them out of
        // the nearest-neighbor min on BOTH engines rather than NaN-race
        when(va > 0 && vb > 0,
          lit(2.0) * wd * (lit(1.0) - rho)).as("dd")
      })
    val nn = d2.groupBy(col("g"), col("ia")).agg(min(col("dd")).as("nnd"))
    val pick = Window.partitionBy(col("g"))
      .orderBy(col("nnd").desc_nulls_last, col("ia"))
    val cnt = stats.groupBy(col("g")).agg(count(lit(1)).as("n_windows"))
    nn.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .join(cnt, "g")
      .select(col("g").as(groupCol), col("n_windows"),
        col("ia").cast("long").as("discord_start"),
        round(col("nnd"), 4).as("discord_d2"))
      .orderBy(col(groupCol))
  }
}
