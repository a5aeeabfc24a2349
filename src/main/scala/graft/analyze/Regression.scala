package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regression diagnostics beyond the per-group OLS of
  * [[Trend.trendLines]]: errors-in-both-variables fitting (Deming), the
  * Breusch-Pagan heteroscedasticity test (is the OLS residual variance
  * constant — if not, the trend line's SEs lie), and the Chow test for a
  * structural break at a known split (did the relation CHANGE, the
  * regression-level cousin of the mean-level changepoint ops).
  *
  * Exactness: inputs quantize to 6-dp longs once; first-pass moments are
  * exact DECIMAL sums; fitted coefficients are one double expression
  * over them (deterministic IEEE, mirrored verbatim in the DuckDB twin);
  * second-pass quantities (squared residuals) re-pin to integer before
  * the second aggregate, so no order-dependent double sum ever occurs.
  *
  * Scale shape: each statistic is one or two corpus hash-aggregates with
  * a broadcast 1-row coefficient frame between them — no window, no
  * shuffle beyond the aggregates themselves.
  */
object Regression {

  private def d19(c: Column) = c.cast("decimal(19,0)")
  private def d38(c: Column) = c.cast("decimal(38,0)")

  private def moments(q: DataFrame): DataFrame =
    q.agg(count(lit(1)).as("n"),
      sum(d19(col("x"))).as("sx"), sum(d19(col("y"))).as("sy"),
      sum(d38(col("x")) * d38(col("x"))).as("sxx"),
      sum(d38(col("y")) * d38(col("y"))).as("syy"),
      sum(d38(col("x")) * d38(col("y"))).as("sxy"))

  /** Deming (errors-in-both-variables, λ = `delta`) regression of y on
    * x: the maximum-likelihood line when BOTH axes carry measurement
    * noise — OLS attenuates the slope toward zero in that setting. One
    * row: `(n, slope, intercept, pearson_r)` at 6 dp. */
  def deming(df: DataFrame, xCol: Column, yCol: Column,
             delta: Double = 1.0): DataFrame = {
    require(delta > 0, s"need delta > 0: $delta")
    val q = df.select(round(xCol * lit(1000000)).cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
    moments(q).select({
      val n = col("n").cast("double")
      val vx = col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / n
      val vy = col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") / n
      val cxy = col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") / n
      val b = when(cxy =!= 0,
        (vy - lit(delta) * vx +
          sqrt((vy - lit(delta) * vx) * (vy - lit(delta) * vx) +
            lit(4.0 * delta) * cxy * cxy)) / (lit(2.0) * cxy))
      val a = (col("sy").cast("double") - b * col("sx").cast("double")) /
        n / 1e6
      Seq(col("n"), round(b, 6).as("slope"), round(a, 6).as("intercept"),
        round(when(vx > 0 && vy > 0, cxy / sqrt(vx * vy)), 6)
          .as("pearson_r"))
    }: _*)
  }

  /** Breusch-Pagan LM test (Koenker's studentized form, `LM = n·R²` of
    * the squared-residual auxiliary regression on x): heteroscedasticity
    * of the OLS fit y ~ x. One row: `(n, slope, lm_stat, r2_aux)` —
    * lm_stat ~ χ²(1) under homoscedasticity; slope is the first-pass OLS
    * slope (y-units per x-unit), 6 dp.
    *
    * The squared residual is re-pinned to a 4-dp integer per row (one
    * deterministic double expression over exact inputs), so the
    * second-pass moments are exact integer sums. */
  def breuschPagan(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val q = df.select(xCol.cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fit = moments(q).select(Seq(col("n"), col("sx")) ++ {
      val n = col("n").cast("double")
      val den = n * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val b = (n * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) / den
      val a = (col("sy").cast("double") - b * col("sx").cast("double")) / n
      Seq(b.as("b"), a.as("a"))
    }: _*)
    // e in value units (de-quantized), u = e² pinned at 4 dp
    val resid = q.crossJoin(broadcast(fit))
      .select(col("x"),
        round(((col("y").cast("double") - col("a") -
          col("b") * col("x").cast("double")) / 1e6) *
          ((col("y").cast("double") - col("a") -
            col("b") * col("x").cast("double")) / 1e6) * 1e4)
          .cast("long").as("u"))
    val aux = resid.agg(count(lit(1)).as("n"),
      sum(d19(col("x"))).as("sx"), sum(d19(col("u"))).as("su"),
      sum(d38(col("x")) * d38(col("x"))).as("sxx"),
      sum(d38(col("u")) * d38(col("u"))).as("suu"),
      sum(d38(col("x")) * d38(col("u"))).as("sxu"))
    aux.crossJoin(broadcast(fit.select(round(col("b") / lit(1e6), 6).as("slope"))))
      .select(Seq(col("n"), col("slope")) ++ {
        val n = col("n").cast("double")
        val vx = n * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val vu = n * col("suu").cast("double") -
          col("su").cast("double") * col("su").cast("double")
        val cxu = n * col("sxu").cast("double") -
          col("sx").cast("double") * col("su").cast("double")
        val r2 = when(vx > 0 && vu > 0, cxu * cxu / (vx * vu))
        Seq(round(n * r2, 4).as("lm_stat"), round(r2, 6).as("r2_aux"))
      }: _*)
  }

  /** Chow test for a coefficient break of y ~ x at a known split:
    * `F = ((SSR_pooled − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n−4))` with
    * per-segment SSRs from closed-form moments. One row:
    * `(n1, n2, ssr_pooled, ssr_within, f_stat)` — SSRs in value units²,
    * 4 dp. Pooled moments are the SUMS of the two segments' exact
    * moments (no second scan). */
  def chow(df: DataFrame, xCol: Column, yCol: Column,
           splitCond: Column): DataFrame = {
    val q = df.select(xCol.cast("long").as("x"),
      round(yCol * lit(1000000)).cast("long").as("y"),
      when(splitCond, 1L).otherwise(0L).as("seg"))
    val segs = q.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(d19(col("x"))).as("sx"), sum(d19(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"))
    def ssr(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column,
            sxy: Column): Column = {
      val nd = n.cast("double")
      val vx = sxx.cast("double") - sx.cast("double") * sx.cast("double") / nd
      val vy = syy.cast("double") - sy.cast("double") * sy.cast("double") / nd
      val cxy = sxy.cast("double") - sx.cast("double") * sy.cast("double") / nd
      when(vx > 0, vy - cxy * cxy / vx).otherwise(vy)
    }
    val wide = segs.agg(
      sum(when(col("seg") === 1, col("n")).otherwise(0L)).as("n1"),
      sum(when(col("seg") === 0, col("n")).otherwise(0L)).as("n2"),
      max(when(col("seg") === 1, col("sx"))).as("sx1"),
      max(when(col("seg") === 1, col("sy"))).as("sy1"),
      max(when(col("seg") === 1, col("sxx"))).as("sxx1"),
      max(when(col("seg") === 1, col("syy"))).as("syy1"),
      max(when(col("seg") === 1, col("sxy"))).as("sxy1"),
      max(when(col("seg") === 0, col("sx"))).as("sx2"),
      max(when(col("seg") === 0, col("sy"))).as("sy2"),
      max(when(col("seg") === 0, col("sxx"))).as("sxx2"),
      max(when(col("seg") === 0, col("syy"))).as("syy2"),
      max(when(col("seg") === 0, col("sxy"))).as("sxy2"))
    wide.select({
      val s1 = ssr(col("n1"), col("sx1"), col("sy1"), col("sxx1"),
        col("syy1"), col("sxy1"))
      val s2 = ssr(col("n2"), col("sx2"), col("sy2"), col("sxx2"),
        col("syy2"), col("sxy2"))
      val sp = ssr(col("n1") + col("n2"), col("sx1") + col("sx2"),
        col("sy1") + col("sy2"), col("sxx1") + col("sxx2"),
        col("syy1") + col("syy2"), col("sxy1") + col("sxy2"))
      val n = (col("n1") + col("n2")).cast("double")
      val f = when(s1 + s2 > 0,
        ((sp - s1 - s2) / 2.0) / ((s1 + s2) / (n - 4)))
      // SCALE-0 rounding (round(x·10⁴)/10⁴), not round(x, 4) — the q197
      // convention: at SSR magnitudes (~1e13 for a price series) 4 dp
      // exceeds double precision, and Spark's decimal-exact Round
      // diverges from the engines that round via a lossy ×10⁴ scaling
      // (caught by the sf0.001 sweep: ...557.871 vs ...557.867)
      Seq(col("n1"), col("n2"),
        (round(sp / 1e12 * 1e4) / 1e4).as("ssr_pooled"),
        (round((s1 + s2) / 1e12 * 1e4) / 1e4).as("ssr_within"),
        (round(f * 1e4) / 1e4).as("f_stat"))
    }: _*)
  }
}
