package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite UNBOUNDED levenshtein comparisons against
  * an integer literal into Spark's THRESHOLD form —
  * `levenshtein(a, b) <= k` becomes `levenshtein(a, b, k) >= 0`.
  *
  * Why: the threshold form runs the banded O(k·n) early-exit DP
  * instead of the full O(n·m) matrix (ScaleStress `lev` measures the
  * gap on long strings), and it is exactly what this library's own
  * fuzzy operators call explicitly (Dedup.fuzzyPairs1/2) — the rule
  * gives USER-written naive predicates the same path for free, the
  * Catalyst way: optimize the declarative plan, don't ask callers to
  * know engine internals.
  *
  * Semantics are identical by the threshold contract (distance if
  * <= k, else -1, null in = null out): `lev <= k` ⟺
  * `lev(threshold = k) >= 0`, and strict `< k` rewrites with k−1.
  * Non-positive bounds are left alone (always-false predicates are
  * the constant-folder's business, not ours). Both literal sides
  * handled. Registered by [[graft.GraftExtensions]] via
  * injectOptimizerRule; also usable per-session through
  * `spark.experimental.extraOptimizations`.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => bounded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => bounded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => bounded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => bounded(a, b, k - 1)
    }
}
