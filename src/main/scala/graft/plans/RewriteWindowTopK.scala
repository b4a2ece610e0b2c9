package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous SQL top-k-per-group idiom
  *
  * {{{
  *   SELECT <cols without rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) AS rn FROM t)
  *   WHERE rn <= k
  * }}}
  *
  * into the heap-based [[TopKPerGroupPlan]] operator. The window
  * formulation must fully sort every group to assign row numbers it then
  * throws away; the rewrite keeps a size-k heap per group instead — same
  * one exchange, no sort, O(n log k) comparisons (measured 2x at sf0.1,
  * growing with rows-per-group).
  *
  * Deliberately conservative — the rewrite fires only when:
  *   - the window computes exactly one expression, a `row_number()` over
  *     a non-empty PARTITION BY with the standard row frame;
  *   - the filter is a single `rn <= k` / `rn < k` / `rn = 1` comparison
  *     against an integer literal on that row number alone;
  *   - the projection above drops the row number (references only child
  *     columns) — if rn is in the output it must be materialized, and
  *     only the window operator can do that.
  *
  * Both formulations pick an arbitrary-but-valid k rows when the order is
  * not total over a group — semantics match tie-for-tie.
  *
  * Registered via [[graft.GraftExtensions]] (spark.sql.extensions) or at
  * runtime with [[TopKPerGroup.ensureRule]].
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond, Window(Seq(alias @ Alias(we: WindowExpression, _)),
          partSpec, orderSpec, child, _)))
        if partSpec.nonEmpty && isPlainRowNumber(we) =>
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && orderSpec.nonEmpty &&
            projList.forall(_.references.subsetOf(child.outputSet)) =>
          // Spark's own InferWindowGroupLimit may already have inserted a
          // WindowGroupLimit below the window (a partial per-partition
          // top-k that still SORTS each partition); the heap operator
          // subsumes it — strip it so no sort survives anywhere.
          val input = child match {
            case WindowGroupLimit(ps, os, _, limit, grandchild)
                if ps == partSpec && os == orderSpec && limit >= k => grandchild
            case other => other
          }
          Project(projList, TopKPerGroupPlan(partSpec, orderSpec, k, input))
        case Some(k) if k > 0 && orderSpec.isEmpty &&
            projList.forall(_.references.subsetOf(child.outputSet)) =>
          // Decorrelated `LATERAL (... ORDER BY o LIMIT k)`: Catalyst emits
          // the subquery's ORDER BY as a GLOBAL Sort below the window and
          // leaves the window's own order spec EMPTY, so the row_number
          // assignment silently depends on the shuffle preserving sorted
          // order — true in local mode, NOT contractual across a cluster's
          // fetch interleave. Recover the intended order from that Sort,
          // make it the heap's explicit order, and drop the Sort itself
          // (a full range-exchange + global sort the heap never needed).
          sortBelow(child) match {
            case Some((order, rebuilt)) if order.nonEmpty &&
                order.forall(_.deterministic) =>
              Project(projList, TopKPerGroupPlan(partSpec, order, k, rebuilt))
            case _ => p
          }
        case _ => p
      }
  }

  /** For an order-spec-less window input, the Sort supplying its row order:
    * directly below, or below one Project. Returns the sort order plus a
    * child equivalent to the window input with the Sort removed — any
    * sort-key columns the intervening Project dropped are passed back
    * through (the parent Project added by the rewrite prunes them again).
    */
  private def sortBelow(child: LogicalPlan): Option[(Seq[SortOrder], LogicalPlan)] =
    child match {
      // only a GLOBAL sort defines a total per-group order; a
      // sortWithinPartitions orders rows partition-locally and must not
      // be promoted to the heap's order (nor dropped)
      case s: Sort if s.global => Some((s.order, s.child))
      case Project(innerList, s: Sort) if s.global =>
        val missing = AttributeSet(s.order.flatMap(_.references)) --
          AttributeSet(innerList.map(_.toAttribute))
        if (missing.subsetOf(s.child.outputSet))
          Some((s.order, Project(innerList ++ missing.toSeq, s.child)))
        else None
      case _ => None
    }

  private def isPlainRowNumber(we: WindowExpression): Boolean = we match {
    case WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))) => true
    case _ => false
  }

  /** The k bound expressed by `cond` over the row-number attribute, if
    * `cond` is exactly one supported comparison shape.
    */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }
}
