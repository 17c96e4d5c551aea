package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the classic top-k-per-group idiom
  *
  * {{{ Filter(rn <= k, Window(row_number() over (partition ORDER BY o) AS rn, child)) }}}
  *
  * (the reference's W1 dedup and W2 top-1 patterns,
  * `/root/reference/src/batch_clean_historical.py:34-37` and
  * `src/batch_analytics.py:47-49`) into
  *
  * {{{ Filter(rn <= k, Window(rn, TopKPerGroup(partition, o, k, child))) }}}
  *
  * — the bounded-heap operator prunes each group to k rows BEFORE the
  * window, so the exchange moves ≤ k·groups rows per partition and the
  * remaining window/filter run over k rows per group instead of the
  * whole table. The rewritten plan is row-identical: [[TopKPerGroupExec]]
  * keeps exactly the rows `row_number() <= k` would keep (same
  * partition keys, same ordering, ties included), and the re-computed
  * `rn` over those rows reproduces the original numbering.
  *
  * Guards: exactly one window expression, and it is `row_number()` with
  * the standard (UnboundedPreceding, CurrentRow) frame; the filter
  * bounds that attribute from above with a positive integer literal
  * (`rn <= k`, `rn < k`, `rn = 1`), possibly alongside `IsNotNull(rn)`;
  * batch plans only.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitFor(cond: Expression, rn: Attribute): Option[Int] = {
    val conjuncts = splitConjuncts(cond)
    // every conjunct must be about rn (the filter sits directly on the
    // window output, so stray predicates are not expected — bail if any)
    val limits = conjuncts.flatMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rn) => Some(1)
      case IsNotNull(a: Attribute) if a.semanticEquals(rn) => None
      case _ => return None // unrecognized conjunct — don't rewrite
    }
    limits match {
      case Seq(k) if k >= 1 => Some(k)
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case Literal(v: Long, org.apache.spark.sql.types.LongType)
        if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.isStreaming) return plan
    plan.transformUp {
      // the !TopKPerGroup guard makes the rule idempotent — user batches
      // run to fixed point, and re-matching our own output would nest
      // one operator per iteration
      case f @ Filter(cond, w @ Window(Seq(alias), _, _, child, _))
          if isRowNumber(alias) && !child.isStreaming &&
            !child.isInstanceOf[TopKPerGroup] =>
        val rnAttr = alias.asInstanceOf[Alias].toAttribute
        limitFor(cond, rnAttr) match {
          case Some(k) =>
            val spec = alias.asInstanceOf[Alias].child
              .asInstanceOf[WindowExpression].windowSpec
            Filter(cond, w.copy(child =
              TopKPerGroup(spec.partitionSpec, spec.orderSpec, k, child)))
          case None => f
        }
    }
  }

  private def isRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, order, frame)), _) =>
      order.nonEmpty && (frame match {
        case SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow) => true
        case _ => false
      })
    case _ => false
  }
}
