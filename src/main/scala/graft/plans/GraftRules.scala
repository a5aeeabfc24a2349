package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalize

/** Catalyst optimizer rules for graft expressions — the `Rule[LogicalPlan]`
  * rung of the custom-operator ladder (expressions → aggregates → plan
  * node + strategy → optimizer rules), injected via
  * [[graft.GraftExtensions]] `injectOptimizerRule`.
  *
  * [[CollapseNfc]]: NFC normalization is idempotent
  * (`nfc(nfc(x)) == nfc(x)` — Unicode canonical composition is a
  * projection onto its own image), so nested applications collapse to
  * one. Composed pipelines produce the nested form naturally — e.g. a
  * caller canonicalizing text that an upstream operator (or view)
  * already canonicalized — and each eliminated layer removes one full
  * `isNormalized` scan per row from the hot path. The rewrite is
  * expression-local and cannot change results.
  */
object CollapseNfc extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
