package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, ExpressionInfo, Size, SortArray}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the natural DataFrame form
  *
  *   size(array_intersect(array_distinct(a), array_distinct(b)))
  *
  * into [[SortedLongIntersectCount]](sort_array(array_distinct(a)), …) when
  * the element type is LONG.
  *
  * Soundness: `array_distinct` guarantees duplicate-free inputs, under
  * which the built-in's distinct-intersection cardinality equals the
  * two-pointer merge count over the sorted arrays; `sort_array` only
  * reorders. The rewrite is therefore value-preserving exactly on the
  * guarded pattern — on anything else (possible duplicates, other element
  * types) it does not fire.
  *
  * Why a rule and not "just call the fast function": callers can keep
  * writing the idiomatic built-in composition; the optimizer owns the
  * physical choice — the same division of labor Catalyst applies
  * everywhere else (e.g. sort+limit → TakeOrderedAndProject).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def isDistinctLongArray(e: Expression): Boolean = e match {
    case ArrayDistinct(c) => c.dataType match {
      // containsNull must be false: ArrayData.getLong reads a NULL slot as 0
      // in the merge loop, whereas array_intersect treats NULL as a distinct
      // element — the rewrite would miscount arrays holding NULLs.
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=false only: under the legacy flag size(NULL) = -1,
      // but SortedLongIntersectCount is null-propagating — firing there
      // would change NULL-input results from -1 to NULL.
      case Size(ArrayIntersect(a, b), false) if isDistinctLongArray(a) && isDistinctLongArray(b) =>
        SortedLongIntersectCount(
          SortArray(a, Literal(true)), SortArray(b, Literal(true)))
    }
}

/** Session-extension wiring: registers the optimizer rule and exposes the
  * native expressions to SQL as `graft_intersect_count(a, b)` and
  * `graft_polyhash(s)`-free composition. Install with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  * Sessions built without extensions can still opt in at runtime through
  * `spark.experimental.extraOptimizations` (see Registry docs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => IntersectCountRewrite)
    e.injectFunction((
      new FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "graft_intersect_count"),
      (children: Seq[Expression]) =>
        SortedLongIntersectCount(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_seq_dot"),
      new ExpressionInfo(classOf[SeqDotProduct].getName, "graft_seq_dot"),
      (children: Seq[Expression]) =>
        SeqDotProduct(children(0), children(1))))
  }
}
