package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: route the idiomatic top-k-per-group pattern —
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY g ORDER BY o)))
  *
  * — through the native bounded-heap operator by inserting
  * [[TopKPerGroup]] UNDER the Window. The Window (and the rank filter)
  * stay in place, so the plan is semantically identical — but the Window
  * now sorts k·|groups| surviving rows instead of the whole relation.
  * Every existing `row_number <= k` query in the registry accelerates
  * without a code change (and the 140-query DuckDB oracle suite is the
  * regression net for this rule).
  *
  * Guards (all load-bearing):
  *  - exactly ONE window expression, and it is `row_number()` — rank()
  *    and dense_rank() can keep MORE than k rows under ties, which a
  *    k-bounded heap cannot represent;
  *  - the rank predicate compares the row_number output against an
  *    integer literal (`<= k`, `< k+1`, or `= k`, the dedup-keeper form);
  *    other conjuncts are fine — they keep filtering after the Window;
  *  - the window has a non-empty ORDER BY (row_number over an unordered
  *    frame is arbitrary; the heap would pick a different arbitrary set);
  *  - tie behavior at the k boundary is row_number's: arbitrary among
  *    tied rows. The rewrite preserves the nondeterminism class, and
  *    deterministic (total) orderings — which every oracle-checked query
  *    uses — are bit-stable.
  *
  * Disable with `spark.graft.topkRewrite.enabled=false` (TopKBench does,
  * to measure the unrewritten window form).
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** (boundAttr, k) when `e` bounds an attribute to ranks 1..k. */
  private def rankBound(e: Expression): Option[(Attribute, Int)] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
    case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k - 1))
    case EqualTo(a: Attribute, IntegerLiteral(k)) => Some((a, k))
    // mirrored literal-on-left forms (`5 >= rn`)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
    case GreaterThan(IntegerLiteral(k), a: Attribute) => Some((a, k - 1))
    case EqualTo(IntegerLiteral(k), a: Attribute) => Some((a, k))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // parseBoolean is case-insensitive, so `TRUE`/`True` enable as expected
    if (!java.lang.Boolean.parseBoolean(
        conf.getConfString("spark.graft.topkRewrite.enabled", "true"))) return plan
    plan.transformUp {
      case f @ Filter(cond,
          w @ Window(Seq(Alias(WindowExpression(RowNumber(), spec), _)), part, order, child, _))
          if order.nonEmpty && !child.isInstanceOf[TopKPerGroup] =>
        val rnAttr = w.windowOutputSet.head
        // heap memory is O(groups × k) rows with NO spill path — past this
        // bound the sort-based Window (which spills) is the safer plan, and
        // a k near Int.MaxValue would overflow the heap capacity outright
        // toIntOption: a malformed or out-of-range conf value must not
        // throw from inside the optimizer (it would fail EVERY query with
        // no hint which conf did it) — fall back to the default instead
        val maxK = conf.getConfString("spark.graft.topkRewrite.maxK", "1000000")
          .toIntOption.filter(_ > 0).getOrElse(1000000)
        conjuncts(cond).flatMap(rankBound).collectFirst {
          case (a, k) if a.exprId == rnAttr.exprId && k > 0 && k <= maxK => k
        } match {
          case Some(k) =>
            f.copy(child = w.copy(child = TopKPerGroup(part, order, k, child)))
          case None => f
        }
    }
  }
}
