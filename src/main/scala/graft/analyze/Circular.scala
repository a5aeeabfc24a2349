package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Circular (directional) statistics over the time-of-day / day-of-week
  * cycle — the family every activity-rhythm question actually lives in:
  * "is traffic uniform around the clock?" (Rayleigh, Kuiper), "when is
  * each event type's peak hour and how concentrated is it?" (circular
  * mean / resultant length), "does the metric track the clock phase?"
  * (Mardia circular-linear correlation). Linear statistics silently lie
  * on a circle (the mean of 23:00 and 01:00 is NOON); these don't.
  *
  * Engine-portable determinism: the only transcendentals on the unit
  * circle are cos/sin of the 24 fixed hour angles `2πh/24` — they are
  * computed ONCE here in Scala (StrictMath), quantized to 12-dp LONGS,
  * and the SAME integer literals are embedded in the Spark plan and in
  * the generated DuckDB oracle SQL ([[hourCosSinValues]]), so both
  * engines fold exact integers and meet only at the final double
  * division / atan2 / sqrt, each a single IEEE op under a terminal
  * round. Per-hour tallies ride DECIMAL(38,0) sums — exact at any
  * corpus size.
  *
  * Scale shape: every statistic folds through a ≤24-row (hour) or
  * ≤7-row (weekday) histogram — ONE map-side-combinable aggregate over
  * the corpus, then literal-bounded arithmetic. Nothing downstream of
  * the first aggregate scales with the data. */
object Circular {

  /** (hour, cos·1e12, sin·1e12) for the 24 hour angles — the shared
    * source of truth for both engines. */
  val hourCosSinValues: IndexedSeq[(Int, Long, Long)] =
    (0 until 24).map { h =>
      val theta = 2.0 * StrictMath.PI * h / 24.0
      (h, StrictMath.round(StrictMath.cos(theta) * 1e12),
        StrictMath.round(StrictMath.sin(theta) * 1e12))
    }

  private def c12Arr: Column =
    array(hourCosSinValues.map { case (_, c, _) => lit(c) }: _*)
  private def s12Arr: Column =
    array(hourCosSinValues.map { case (_, _, s) => lit(s) }: _*)

  /** SQL VALUES list `(h, c12, s12)` carrying the same literals. */
  def hourCosSinSql: String =
    hourCosSinValues.map { case (h, c, s) => s"($h, ${c}::BIGINT, ${s}::BIGINT)" }
      .mkString("(VALUES ", ", ", ") AS hcs(h, c12, s12)")

  /** Rayleigh test of hour-of-day uniformity: one row
    * `(n, rbar, z, p_value)` — resultant length R̄ of the n unit vectors
    * at the event hours, z = n·R̄², p from the standard small-sample
    * correction (Zar 1999): `p = e^{−z}·(1 + (2z − z²)/(4n))`, clamped
    * to [0, 1]. Large z ⇒ a concentrated daily rhythm. */
  def rayleighHourly(df: DataFrame, tsCol: Column): DataFrame = {
    val hist = df.select(hour(tsCol).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("nh"))
    val agg = hist.agg(
      sum(col("nh")).as("n"),
      sum(col("nh").cast("decimal(38,0)") *
        element_at(c12Arr, col("h") + 1).cast("decimal(38,0)")).as("c"),
      sum(col("nh").cast("decimal(38,0)") *
        element_at(s12Arr, col("h") + 1).cast("decimal(38,0)")).as("s"))
    val n = col("n").cast("double")
    val c = col("c").cast("double") / 1e12
    val s = col("s").cast("double") / 1e12
    val rbar = sqrt(c * c + s * s) / n
    val z = n * rbar * rbar
    agg.select(col("n"), round(rbar, 6).as("rbar"), round(z, 6).as("z"),
      round(greatest(lit(0.0), least(lit(1.0),
        exp(-z) * (lit(1.0) + (z * 2 - z * z) / (n * 4)))), 6).as("p_value"))
  }

  /** DuckDB twin of [[rayleighHourly]] over a table with timestamp
    * column `tsExpr` (same literals, same fold shape). */
  def rayleighOracleSql(table: String, tsExpr: String): String =
    s"""WITH hist AS (SELECT hour($tsExpr) AS h, count(*) AS nh FROM $table GROUP BY 1),
       agg AS (SELECT CAST(sum(nh) AS BIGINT) AS n,
                      sum(CAST(nh AS HUGEINT) * c12) AS cq,
                      sum(CAST(nh AS HUGEINT) * s12) AS sq
               FROM hist JOIN $hourCosSinSql ON hist.h = hcs.h),
       -- the EXACT expression tree of the Spark side: c, s, then
       -- rbar = sqrt(c*c + s*s)/n, z = n*rbar*rbar — sqrt-squared, not
       -- the algebraic (c²+s²)/n, which can differ by an ulp
       d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                    CAST(cq AS DOUBLE) / 1e12 AS c,
                    CAST(sq AS DOUBLE) / 1e12 AS s FROM agg),
       r AS (SELECT n, nd, sqrt(c*c + s*s) / nd AS rbar FROM d),
       zt AS (SELECT n, nd, rbar, nd * rbar * rbar AS z FROM r)
       SELECT n, round(rbar, 6) AS rbar, round(z, 6) AS z,
              round(greatest(0.0, least(1.0,
                exp(-z) * (1.0 + (z * 2 - z * z) / (nd * 4)))), 6) AS p_value
       FROM zt"""

  /** Per-group circular summary of the hour-of-day distribution:
    * `(grp, n, mean_hour, rbar, circ_var, circ_sd)` — mean direction
    * mapped back to fractional hours in [0, 24), circular variance
    * 1 − R̄, circular SD `√(−2·ln R̄)` (NULL when R̄ = 0: direction
    * undefined). */
  def hourlySummary(df: DataFrame, groupCol: Column, tsCol: Column): DataFrame = {
    val hist = df.select(groupCol.as("grp"), hour(tsCol).as("h"))
      .groupBy(col("grp"), col("h")).agg(count(lit(1)).as("nh"))
    val agg = hist.groupBy(col("grp")).agg(
      sum(col("nh")).as("n"),
      sum(col("nh").cast("decimal(38,0)") *
        element_at(c12Arr, col("h") + 1).cast("decimal(38,0)")).as("c"),
      sum(col("nh").cast("decimal(38,0)") *
        element_at(s12Arr, col("h") + 1).cast("decimal(38,0)")).as("s"))
    val n = col("n").cast("double")
    val c = col("c").cast("double") / 1e12
    val s = col("s").cast("double") / 1e12
    // clamp at 1: the 12-dp cos/sin quantization can push a perfectly
    // concentrated group's resultant to 1 + O(1e-13), which would send
    // ln(R̄) positive and the circular SD to NaN
    val rbar = least(sqrt(c * c + s * s) / n, lit(1.0))
    // atan2 ∈ (−π, π] → [0, 2π) → hours; pmod wraps negatives, and the
    // OUTER pmod folds a post-round 24.0000 (a resultant an ulp shy of
    // the midnight seam) back to 0.0 in both engines
    val meanHour = pmod(round(
      pmod(atan2(s, c) * lit(12.0 / StrictMath.PI), lit(24.0)), 4), lit(24.0))
    agg.select(col("grp"), col("n"),
        meanHour.as("mean_hour"), round(rbar, 6).as("rbar"),
        round(lit(1.0) - rbar, 6).as("circ_var"),
        round(when(rbar >= 1, lit(0.0))
          .when(rbar > 0, sqrt(-log(rbar) * 2)), 6).as("circ_sd"))
      .orderBy(col("grp"))
  }

  /** DuckDB twin of [[hourlySummary]]. */
  def hourlySummaryOracleSql(table: String, grpExpr: String, tsExpr: String): String =
    s"""WITH hist AS (SELECT $grpExpr AS grp, hour($tsExpr) AS h, count(*) AS nh FROM $table GROUP BY 1, 2),
       agg AS (SELECT grp, CAST(sum(nh) AS BIGINT) AS n,
                      CAST(sum(CAST(nh AS HUGEINT) * c12) AS DOUBLE) / 1e12 AS c,
                      CAST(sum(CAST(nh AS HUGEINT) * s12) AS DOUBLE) / 1e12 AS s
               FROM hist JOIN $hourCosSinSql ON hist.h = hcs.h GROUP BY grp),
       r AS (SELECT grp, n, c, s,
                    least(sqrt(c*c + s*s) / CAST(n AS DOUBLE), 1.0) AS rbar FROM agg)
       SELECT grp, n,
         round(((atan2(s, c) * ${12.0 / StrictMath.PI}) % 24.0 + 24.0) % 24.0, 4) % 24.0 AS mean_hour,
         round(rbar, 6) AS rbar,
         round(1.0 - rbar, 6) + 0.0 AS circ_var,
         round(CASE WHEN rbar >= 1 THEN 0.0
                    WHEN rbar > 0 THEN sqrt(-ln(rbar) * 2) END, 6) AS circ_sd
       FROM r ORDER BY grp"""

  /** Kuiper test of day-of-week uniformity (the rotation-invariant KS —
    * equally sensitive at every point of the cycle, where KS goes blind
    * at its arbitrary origin). Discrete 7-point lattice: with weekday
    * counts n_d (d = 0..6, 0 = Sunday), empirical CDF F_d = cum_d/n,
    * uniform CDF U_d = (d+1)/7; `D⁺ = max(F_d − U_d)`,
    * `D⁻ = max(U_d − F_{d−1})`, `V = D⁺ + D⁻`, and the standardized
    * `stat = V·(√n + 0.155 + 0.24/√n)` (Stephens 1970). One row
    * `(n, d_plus, d_minus, v, stat)`; every CDF value is one IEEE
    * division of exact integers — engine-identical before the final
    * rounds. */
  def kuiperWeekday(df: DataFrame, tsCol: Column): DataFrame = {
    // Spark dayofweek is 1..7 (1 = Sunday); −1 matches DuckDB's 0..6
    val hist = df.select((dayofweek(tsCol) - 1).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("nd"))
    // the 7-row frame: dense 0..6 axis so absent weekdays count as 0
    val axis = df.sparkSession.range(0, 7).select(col("id").as("d"))
    val dense = axis.join(hist, Seq("d"), "left")
      .select(col("d"), coalesce(col("nd"), lit(0L)).as("nd"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("d")).rowsBetween(Long.MinValue, 0)
    val cdf = dense
      .withColumn("cum", sum(col("nd")).over(w))
      .withColumn("n", sum(col("nd")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("d")).rowsBetween(Long.MinValue, Long.MaxValue)))
      .select(col("d"), col("n"),
        (col("cum").cast("double") / col("n")).as("f"),
        ((col("cum") - col("nd")).cast("double") / col("n")).as("f_prev"),
        ((col("d") + 1).cast("double") / lit(7.0)).as("u"))
    cdf.agg(max(col("n")).as("n"),
        max(col("f") - col("u")).as("dp"),
        max(col("u") - col("f_prev")).as("dm"))
      .select(col("n"), round(col("dp"), 6).as("d_plus"),
        round(col("dm"), 6).as("d_minus"),
        round(col("dp") + col("dm"), 6).as("v"),
        round((col("dp") + col("dm")) *
          (sqrt(col("n").cast("double")) + lit(0.155) +
            lit(0.24) / sqrt(col("n").cast("double"))), 4).as("stat"))
  }

  /** DuckDB twin of [[kuiperWeekday]]. */
  def kuiperOracleSql(table: String, tsExpr: String): String =
    s"""WITH hist AS (SELECT dayofweek($tsExpr) AS d, count(*) AS nd FROM $table GROUP BY 1),
       dense AS (SELECT axis.d, coalesce(hist.nd, 0) AS nd
                 FROM (SELECT unnest(range(7)) AS d) axis LEFT JOIN hist ON axis.d = hist.d),
       cdf AS (SELECT d, sum(nd) OVER (ORDER BY d) AS cum, nd,
                      sum(nd) OVER () AS n FROM dense),
       t AS (SELECT CAST(n AS BIGINT) AS n,
                    CAST(cum AS DOUBLE) / n AS f,
                    CAST(cum - nd AS DOUBLE) / n AS f_prev,
                    CAST(d + 1 AS DOUBLE) / 7.0 AS u FROM cdf),
       m AS (SELECT max(n) AS n, max(f - u) AS dp, max(u - f_prev) AS dm FROM t)
       SELECT n, round(dp, 6) AS d_plus, round(dm, 6) AS d_minus,
              round(dp + dm, 6) AS v,
              round((dp + dm) * (sqrt(CAST(n AS DOUBLE)) + 0.155 + 0.24 / sqrt(CAST(n AS DOUBLE))), 4) AS stat
       FROM m"""

  /** Mardia circular-linear correlation between the hour-of-day angle θ
    * and a linear metric x: `r² = (r_xc² + r_xs² − 2·r_xc·r_xs·r_cs) /
    * (1 − r_cs²)` with r_xc = corr(x, cos θ) etc. One row
    * `(n, r_xc, r_xs, r_cs, r2)` — "does the metric follow the clock"
    * with the phase estimated, not assumed. x is pinned at 6 dp; all
    * ten co-moments are exact DECIMAL(38,0) folds of integer products. */
  def circularLinearCorr(df: DataFrame, tsCol: Column, xCol: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val base = df.select(hour(tsCol).as("h"),
        round(xCol * 1e6).cast("long").as("xq"))
      .select(col("xq"), element_at(c12Arr, col("h") + 1).as("c12"),
        element_at(s12Arr, col("h") + 1).as("s12"))
    val m = base.agg(
      count(lit(1)).as("n"),
      sum(d(col("xq"))).as("sx"), sum(d(col("c12"))).as("sc"),
      sum(d(col("s12"))).as("ss"),
      sum(d(col("xq")) * d(col("xq"))).as("sxx"),
      sum(d(col("c12")) * d(col("c12"))).as("scc"),
      sum(d(col("s12")) * d(col("s12"))).as("sss"),
      sum(d(col("xq")) * d(col("c12"))).as("sxc"),
      sum(d(col("xq")) * d(col("s12"))).as("sxs"),
      sum(d(col("c12")) * d(col("s12"))).as("scs"))
    val n = col("n").cast("double")
    def cov(sab: Column, sa: Column, sb: Column) =
      n * sab.cast("double") - sa.cast("double") * sb.cast("double")
    def va(saa: Column, sa: Column) = cov(saa, sa, sa)
    def corr2(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
      when(va(saa, sa) > 0 && va(sbb, sb) > 0,
        cov(sab, sa, sb) / sqrt(va(saa, sa) * va(sbb, sb)))
    val rxc = corr2(col("sxc"), col("sx"), col("sc"), col("sxx"), col("scc"))
    val rxs = corr2(col("sxs"), col("sx"), col("ss"), col("sxx"), col("sss"))
    val rcs = corr2(col("scs"), col("sc"), col("ss"), col("scc"), col("sss"))
    val r2 = when(rcs * rcs < 1.0,
      (rxc * rxc + rxs * rxs - rxc * rxs * rcs * 2) / (lit(1.0) - rcs * rcs))
    m.select(col("n"), round(rxc, 6).as("r_xc"), round(rxs, 6).as("r_xs"),
      round(rcs, 6).as("r_cs"), round(r2, 6).as("r2"))
  }

  /** DuckDB twin of [[circularLinearCorr]]. */
  def circularLinearOracleSql(table: String, tsExpr: String, xExpr: String): String =
    s"""WITH base AS (SELECT CAST(round(($xExpr) * 1e6) AS BIGINT) AS xq, c12, s12
                 FROM $table JOIN $hourCosSinSql ON hour($tsExpr) = hcs.h),
       m AS (SELECT count(*) AS n,
               sum(CAST(xq AS HUGEINT)) AS sx, sum(CAST(c12 AS HUGEINT)) AS sc, sum(CAST(s12 AS HUGEINT)) AS ss,
               sum(CAST(xq AS HUGEINT) * xq) AS sxx, sum(CAST(c12 AS HUGEINT) * c12) AS scc,
               sum(CAST(s12 AS HUGEINT) * s12) AS sss,
               sum(CAST(xq AS HUGEINT) * c12) AS sxc, sum(CAST(xq AS HUGEINT) * s12) AS sxs,
               sum(CAST(c12 AS HUGEINT) * s12) AS scs
             FROM base),
       r AS (SELECT n,
               CASE WHEN (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                     AND (n*CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE)) > 0
                 THEN (n*CAST(sxc AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sc AS DOUBLE))
                    / sqrt((n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                         * (n*CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))) END AS rxc,
               CASE WHEN (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                     AND (n*CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE)*CAST(ss AS DOUBLE)) > 0
                 THEN (n*CAST(sxs AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(ss AS DOUBLE))
                    / sqrt((n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                         * (n*CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE)*CAST(ss AS DOUBLE))) END AS rxs,
               CASE WHEN (n*CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE)) > 0
                     AND (n*CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE)*CAST(ss AS DOUBLE)) > 0
                 THEN (n*CAST(scs AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(ss AS DOUBLE))
                    / sqrt((n*CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))
                         * (n*CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE)*CAST(ss AS DOUBLE))) END AS rcs
             FROM m)
       SELECT CAST(n AS BIGINT) AS n, round(rxc, 6) + 0.0 AS r_xc, round(rxs, 6) + 0.0 AS r_xs,
              round(rcs, 6) + 0.0 AS r_cs,
              round(CASE WHEN rcs*rcs < 1.0
                THEN (rxc*rxc + rxs*rxs - rxc*rxs*rcs*2) / (1.0 - rcs*rcs) END, 6) + 0.0 AS r2
       FROM r"""
}
