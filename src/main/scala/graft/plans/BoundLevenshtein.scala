package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Optimizer rule: rewrite unbounded `levenshtein(a, b)` under a literal
 * comparison into Spark's threshold-bounded kernel, which abandons a row
 * once the running distance exceeds the bound (O(len × k) per pair with a
 * k-wide band, vs O(len_a × len_b) for the full matrix) and returns -1
 * past it.
 *
 * This is the declarative-surface twin of what the library's own
 * [[graft.operators.Dedup.editDistanceVerify]] does by hand: a SQL user
 * writing `WHERE levenshtein(a.text, b.text) <= 100` on 10 kB documents
 * pays the full O(len²) matrix per candidate pair — ~10⁸ cell updates —
 * when only the 100-wide band can ever matter. Catalyst has the bounded
 * kernel but no rewrite to reach it; this rule closes that gap for every
 * comparison shape:
 *
 *   - `lev(a,b) <= k`  →  `lev(a,b,k) >= 0`        (k ≥ 0)
 *   - `lev(a,b) <  k`  →  `lev(a,b,k-1) >= 0`      (k ≥ 1)
 *   - `lev(a,b) >  k`  →  `lev(a,b,k) = -1`        (k ≥ 0)
 *   - `lev(a,b) >= k`  →  `lev(a,b,k-1) = -1`      (k ≥ 1)
 *   - `lev(a,b) =  k`  →  `lev(a,b,k) = k`         (k ≥ 0)
 *
 * plus the mirrored literal-on-the-left forms. NULL semantics are
 * preserved exactly: both sides yield NULL iff an input is NULL (the
 * bounded kernel is as null-intolerant as the unbounded one, and
 * comparisons against a non-null literal keep NULL NULL). The rewrite
 * fires anywhere the expression appears — Filter, Join condition, or a
 * projected boolean — because the replacement is equivalent as a VALUE,
 * not just as a predicate. Negative-k comparisons are left alone (they
 * are degenerate, not worth a kernel call shape change), and an already
 * bounded `levenshtein(a, b, t)` never rematches, so the rule is
 * idempotent under Catalyst's fixed-point batches.
 *
 * Registered by [[graft.GraftSparkExtensions]] (deploy-time
 * `spark.sql.extensions` path) and [[graft.Graft.configure]] (runtime
 * path, via `experimental.extraOptimizations`).
 */
object BoundLevenshtein extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Levenshtein =
    Levenshtein(l, r, Some(Literal(k)))

  /** A non-null int literal — the only bound shape worth rewriting (a
    * long- or otherwise-typed bound arrives wrapped in a Cast of the
    * Levenshtein side and is intentionally not matched). */
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _                            => None
    }
  }

  /** `levenshtein(a, b)` with no threshold yet. */
  private object Unbounded {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(l, r, None) => Some((l, r))
      case _                       => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dist <= k  /  k >= dist
    case LessThanOrEqual(Unbounded(l, r), IntLit(k)) if k >= 0 =>
      GreaterThanOrEqual(bounded(l, r, k), Literal(0))
    case GreaterThanOrEqual(IntLit(k), Unbounded(l, r)) if k >= 0 =>
      GreaterThanOrEqual(bounded(l, r, k), Literal(0))
    // dist < k  /  k > dist
    case LessThan(Unbounded(l, r), IntLit(k)) if k >= 1 =>
      GreaterThanOrEqual(bounded(l, r, k - 1), Literal(0))
    case GreaterThan(IntLit(k), Unbounded(l, r)) if k >= 1 =>
      GreaterThanOrEqual(bounded(l, r, k - 1), Literal(0))
    // dist > k  /  k < dist
    case GreaterThan(Unbounded(l, r), IntLit(k)) if k >= 0 =>
      EqualTo(bounded(l, r, k), Literal(-1))
    case LessThan(IntLit(k), Unbounded(l, r)) if k >= 0 =>
      EqualTo(bounded(l, r, k), Literal(-1))
    // dist >= k  /  k <= dist
    case GreaterThanOrEqual(Unbounded(l, r), IntLit(k)) if k >= 1 =>
      EqualTo(bounded(l, r, k - 1), Literal(-1))
    case LessThanOrEqual(IntLit(k), Unbounded(l, r)) if k >= 1 =>
      EqualTo(bounded(l, r, k - 1), Literal(-1))
    // dist = k  (bounded at k: returns dist iff dist <= k, so = k matches
    // exactly the same rows; -1 ≠ k because k >= 0)
    case EqualTo(Unbounded(l, r), IntLit(k)) if k >= 0 =>
      EqualTo(bounded(l, r, k), Literal(k))
    case EqualTo(IntLit(k), Unbounded(l, r)) if k >= 0 =>
      EqualTo(bounded(l, r, k), Literal(k))
  }
}
