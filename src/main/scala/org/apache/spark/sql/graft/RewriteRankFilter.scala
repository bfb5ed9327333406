package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Literal, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the rank-filter idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(keys).orderBy(o)))
  *      .filter($"rn" <= k).drop("rn") }}}
  *
  * becomes the [[TopKPerKey]] operator. The window form's physical plan
  * sorts every partition and shuffles every row to keep k; the operator
  * keeps bounded heaps and shuffles at most k rows per key per partition —
  * the canonical top-k optimization, applied automatically so every
  * existing query written in the portable idiom gets the scale-safe plan.
  *
  * Two shapes rewrite:
  *  1. `Project(Filter(rn cmp k, Window(row_number)))` where the project
  *     drops the rank column — the Window disappears entirely.
  *  2. A bare `Filter(rn = 1 | rn <= 1, Window(row_number))` (the
  *     top-1-per-key dedup shape): every surviving row has rank exactly 1,
  *     so the rank column is reattached as the literal 1 under the SAME
  *     exprId and the output schema is preserved for whatever sits above.
  *
  * Soundness: matches ONLY a Window computing a single `row_number` over a
  * NON-EMPTY partition spec with the standard (UnboundedPreceding,
  * CurrentRow) row frame. Under order ties both forms keep *some* k rows —
  * identical nondeterminism — and with the total orders the catalog uses,
  * identical rows. k <= 0 never matches (kFromCond yields positive k only).
  */
object RewriteRankFilter extends Rule[LogicalPlan] {

  /** (rank attribute, keys, order) of a single-row_number Window. */
  private def rankWindow(
      w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder])] = w match {
    case Window(Seq(a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(part, ord,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, _, _) if part.nonEmpty && ord.nonEmpty =>
      Some((a.toAttribute, part, ord))
    case _ => None
  }

  /** Spark's own InferWindowGroupLimit inserts a per-partition rank limit
    * below the Window before this rule runs; TopKPerKey's partial phase
    * subsumes it (same bound, heap instead of insertion-sorted buffer), so
    * strip it rather than limiting twice. */
  private def stripGroupLimit(child: LogicalPlan, k: Int): LogicalPlan =
    child match {
      case WindowGroupLimit(_, _, RowNumber(), limit, grandchild)
          if limit >= k => grandchild
      case _ => child
    }

  /** The k of a `rank-limited-to-k` predicate, when positive. */
  private def kFromCond(cond: Expression, rn: Attribute): Option[Int] = {
    val k = cond match {
      case LessThanOrEqual(r: Attribute, IntegerLiteral(v)) if r.semanticEquals(rn) => Some(v)
      case LessThan(r: Attribute, IntegerLiteral(v)) if r.semanticEquals(rn) => Some(v - 1)
      case EqualTo(r: Attribute, IntegerLiteral(1)) if r.semanticEquals(rn) => Some(1)
      case EqualTo(IntegerLiteral(1), r: Attribute) if r.semanticEquals(rn) => Some(1)
      case _ => None
    }
    k.filter(_ >= 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // shape 1: the project above drops the rank column -> drop the Window
    case p @ Project(list, Filter(cond, w: Window)) =>
      (for {
        (rn, keys, ord) <- rankWindow(w)
        k <- kFromCond(cond, rn)
        if !list.exists(_.references.contains(rn))
      } yield Project(list, TopKPerKey(keys, ord, k, stripGroupLimit(w.child, k)))).getOrElse(p)

    // shape 2: top-1 filter with the rank still in scope -> rank is the
    // constant 1 for every survivor; reattach it under the same exprId
    case f @ Filter(cond, w: Window) =>
      (for {
        (rn, keys, ord) <- rankWindow(w)
        k <- kFromCond(cond, rn)
        if k == 1
      } yield Project(
        w.child.output :+ Alias(Literal(1), rn.name)(exprId = rn.exprId),
        TopKPerKey(keys, ord, 1, stripGroupLimit(w.child, 1)))).getOrElse(f)
  }
}
