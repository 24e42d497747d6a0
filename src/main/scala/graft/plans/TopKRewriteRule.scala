package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the ubiquitous per-group-top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).where($"rn" <= k).drop("rn") }}}
  *
  * plans as Window -> Filter -> Project, which SORTS every group in full
  * just to discard all but k rows. When the rank column is consumed
  * nowhere above the filter, this rule swaps the subtree for
  * [[TopKPerKeyPlan]] — the bounded-heap partial+final operator — so
  * existing window-style code (AggOps.topK, argMaxWindow) gets the
  * no-sort plan without being rewritten by hand.
  *
  * Match conditions (all required for semantic equality):
  *   - the Window computes exactly ONE expression, a `row_number()`;
  *   - the filter is `rn <= k` / `rn < k+1` / `rn = 1` on that attribute
  *     alone;
  *   - the projection above drops the rank (references only child
  *     columns).
  *
  * Among order-ties both forms keep an arbitrary-but-size-correct subset,
  * so the rewrite preserves the idiom's (non-)determinism contract; rank,
  * dense_rank and frames other than row_number are left untouched (their
  * tie semantics differ from a bounded heap).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def isRowNumber(alias: Alias): Boolean = alias.child match {
    case WindowExpression(RowNumber(), _) => true
    case _ => false
  }

  /** The k in `rn <= k` forms; None when the predicate is anything else. */
  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.exprId == rn => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.exprId == rn => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.exprId == rn => Some(1)
    case _ => None
  }

  /** Escape hatch: `SET spark.graft.topk.rewrite.enabled=false` restores
    * the stock window plan (whose external sort can spill) for workloads
    * whose per-partition key cardinality overwhelms the heap-state bound
    * documented on [[TopKPerKeyExec]].
    */
  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.rewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case Project(projectList,
        Filter(cond, Window(Seq(alias: Alias), part, order, child, _)))
        if isRowNumber(alias) && order.nonEmpty &&
          // nondeterministic order exprs (rand()) are re-evaluated per
          // heap comparison — leave those to the window operator, which
          // materializes the sort key once per row
          order.forall(_.deterministic) && part.forall(_.deterministic) &&
          limitOf(cond, alias.exprId).exists(_ > 0) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      val k = limitOf(cond, alias.exprId).get
      // Spark's own InferWindowGroupLimit (3.5+) may already have
      // inserted a sort-based WindowGroupLimit below the window; strip
      // it — TopKPerKey subsumes it (bounded heaps, no sort at all)
      val realChild = child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      Project(projectList, TopKPerKeyPlan(part, order, k, realChild))
  }
}
