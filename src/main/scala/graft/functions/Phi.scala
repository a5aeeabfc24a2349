package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Standard-normal CDF Φ as a deterministic elementary-op expression —
  * the missing piece that turns the engine's many z statistics into
  * p-values/probabilities WITHOUT a special-function library on either
  * engine: the Abramowitz-Stegun 7.1.26 rational erf approximation
  * (|ε| ≤ 1.5·10⁻⁷ — two orders below the house 4-dp output contract),
  * built only from +,×,÷,exp — so the EXACT same IEEE operation
  * sequence runs in Spark codegen and in the DuckDB oracle via [[sql]].
  *
  * Both renderings MUST stay operation-for-operation identical: the
  * approximation is bit-reproducible across engines only because the
  * expression tree is. */
object Phi {

  private val P = 0.3275911
  private val A1 = 0.254829592
  private val A2 = -0.284496736
  private val A3 = 1.421413741
  private val A4 = -1.453152027
  private val A5 = 1.061405429
  /** 1/√2, pinned so both engines multiply by the same literal. */
  private val InvSqrt2 = 0.7071067811865476

  /** Φ(x) as a Column expression (A&S 7.1.26 on erf(|x|/√2)). */
  def phi(x: Column): Column = {
    val z = abs(x) * lit(InvSqrt2)
    val t = lit(1.0) / (lit(1.0) + lit(P) * z)
    val poly = ((((lit(A5) * t + lit(A4)) * t + lit(A3)) * t + lit(A2)) * t
      + lit(A1)) * t
    val erf = lit(1.0) - poly * exp(-(z * z))
    lit(0.5) * (lit(1.0) + signum(x) * erf)
  }

  /** The same Φ as a SQL text fragment over the scalar expression `x` —
    * for DuckDB oracle strings; operation order mirrors [[phi]]. */
  def sql(x: String): String = {
    val z = s"(abs($x) * 0.7071067811865476)"
    val t = s"(1.0 / (1.0 + 0.3275911 * $z))"
    val poly = s"(((((1.061405429 * $t + -1.453152027) * $t + 1.421413741)" +
      s" * $t + -0.284496736) * $t + 0.254829592) * $t)"
    val erf = s"(1.0 - $poly * exp(-($z * $z)))"
    s"(0.5 * (1.0 + sign($x) * $erf))"
  }
}
