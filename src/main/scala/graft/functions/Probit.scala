package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Inverse standard-normal CDF Φ⁻¹ (the probit) as a deterministic
  * elementary-op expression — [[Phi]]'s inverse, unlocking the
  * normal-scores statistics (Fligner-Killeen, van der Waerden, QQ
  * grids) WITHOUT a special-function library on either engine: Acklam's
  * piecewise rational approximation (relative |ε| ≤ 1.15·10⁻⁹ — far
  * below the house 4-dp output contract), built only from
  * +,×,÷,√,ln and a three-way branch on fixed literal break points —
  * so the EXACT same IEEE operation sequence runs in Spark codegen and
  * in the DuckDB oracle via [[sql]].
  *
  * Both renderings MUST stay operation-for-operation identical (the
  * [[Phi]] discipline): cross-engine bit-reproducibility holds only
  * because the expression trees do. Input must lie in (0, 1); callers
  * guarantee it (rank-derived arguments are strictly interior). */
object Probit {

  // Acklam (2003) coefficients, central rational in r = (p−1/2)²
  private val A1 = -3.969683028665376e+01
  private val A2 = 2.209460984245205e+02
  private val A3 = -2.759285104469687e+02
  private val A4 = 1.383577518672690e+02
  private val A5 = -3.066479806614716e+01
  private val A6 = 2.506628277459239e+00
  private val B1 = -5.447609879822406e+01
  private val B2 = 1.615858368580409e+02
  private val B3 = -1.556989798598866e+02
  private val B4 = 6.680131188771972e+01
  private val B5 = -1.328068155288572e+01
  // tail rational in q = √(−2 ln p_tail)
  private val C1 = -7.784894002430293e-03
  private val C2 = -3.223964580411365e-01
  private val C3 = -2.400758277161838e+00
  private val C4 = -2.549732539343734e+00
  private val C5 = 4.374664141464968e+00
  private val C6 = 2.938163982698783e+00
  private val D1 = 7.784695709041462e-03
  private val D2 = 3.224671290700398e-01
  private val D3 = 2.445134137142996e+00
  private val D4 = 3.754408661907416e+00
  private val PLow = 0.02425

  /** Φ⁻¹(p) as a Column expression. */
  def probit(p: Column): Column = {
    def tail(q: Column): Column =
      (((((lit(C1) * q + lit(C2)) * q + lit(C3)) * q + lit(C4)) * q +
        lit(C5)) * q + lit(C6)) /
        ((((lit(D1) * q + lit(D2)) * q + lit(D3)) * q + lit(D4)) * q +
          lit(1.0))
    val central = {
      val q = p - lit(0.5)
      val r = q * q
      (((((lit(A1) * r + lit(A2)) * r + lit(A3)) * r + lit(A4)) * r +
        lit(A5)) * r + lit(A6)) * q /
        (((((lit(B1) * r + lit(B2)) * r + lit(B3)) * r + lit(B4)) * r +
          lit(B5)) * r + lit(1.0))
    }
    when(p < lit(PLow), tail(sqrt(lit(-2.0) * log(p))))
      .when(p > lit(1.0) - lit(PLow),
        -tail(sqrt(lit(-2.0) * log(lit(1.0) - p))))
      .otherwise(central)
  }

  /** The same Φ⁻¹ as a SQL text fragment over the scalar expression
    * `p` — for DuckDB oracle strings; operation order mirrors
    * [[probit]]. `p` is spliced several times: bind it to a plain
    * column in a CTE first. */
  def sql(p: String): String = {
    def tail(q: String): String =
      s"((((((-7.784894002430293e-03 * $q + -3.223964580411365e-01) * $q + " +
        s"-2.400758277161838e+00) * $q + -2.549732539343734e+00) * $q + " +
        s"4.374664141464968e+00) * $q + 2.938163982698783e+00) / " +
        s"((((7.784695709041462e-03 * $q + 3.224671290700398e-01) * $q + " +
        s"2.445134137142996e+00) * $q + 3.754408661907416e+00) * $q + 1.0))"
    val qc = s"($p - 0.5)"
    val rc = s"($qc * $qc)"
    val central =
      s"((((((-3.969683028665376e+01 * $rc + 2.209460984245205e+02) * $rc + " +
        s"-2.759285104469687e+02) * $rc + 1.383577518672690e+02) * $rc + " +
        s"-3.066479806614716e+01) * $rc + 2.506628277459239e+00) * $qc / " +
        s"(((((-5.447609879822406e+01 * $rc + 1.615858368580409e+02) * $rc + " +
        s"-1.556989798598866e+02) * $rc + 6.680131188771972e+01) * $rc + " +
        s"-1.328068155288572e+01) * $rc + 1.0))"
    s"(CASE WHEN $p < 0.02425 THEN ${tail(s"sqrt(-2.0 * ln($p))")} " +
      s"WHEN $p > 1.0 - 0.02425 THEN -${tail(s"sqrt(-2.0 * ln(1.0 - $p))")} " +
      s"ELSE $central END)"
  }
}
