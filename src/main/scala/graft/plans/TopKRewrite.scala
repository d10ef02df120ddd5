package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrites the ubiquitous window top-k antipattern
  *
  * {{{
  *   Project [cols...]                      // rn NOT in the output
  *     +- Filter rn <= k
  *        +- Window [row_number() over (partition By p order By o) AS rn]
  * }}}
  *
  * into [[TopKPerGroup]](k, p, o) — bounded per-group heaps instead of a
  * full sort of every partition. Only fires when the rank column itself is
  * discarded (its values can't be reproduced by the heap operator) and the
  * window has both partitioning and ordering.
  *
  * Injected per-session via [[TopKRewrite.install]] (the
  * `SparkSessionExtensions.injectOptimizerRule` path would do the same at
  * session build time).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private object RowNumberWindow {
    /** Matches a Window producing exactly one extra attr = row_number(). */
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order, _)), _)) if part.nonEmpty && order.nonEmpty =>
          Some((a.toAttribute, part, order, w.child))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, RowNumberWindow(rn, part, order, child)))
        if !projectList.exists(_.references.contains(rn)) &&
          projectList.forall(_.isInstanceOf[Attribute]) =>
      // InferWindowGroupLimit (Spark ≥3.5) may already have inserted a
      // WindowGroupLimit + sort under the window; the heap operator
      // subsumes it, so strip it to avoid double work.
      def stripped(k: Int): LogicalPlan = child match {
        case WindowGroupLimit(ps, os, _, limit, grandchild)
            if ps == part && os == order && limit >= k => grandchild
        case other => other
      }
      cond match {
        case LessThanOrEqual(r: Attribute, IntegerLiteral(k))
            if r.semanticEquals(rn) && k > 0 =>
          Project(projectList, TopKPerGroup(k, part, order, stripped(k)))
        case LessThan(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) && k > 1 =>
          Project(projectList, TopKPerGroup(k - 1, part, order, stripped(k - 1)))
        case _ => p
      }
  }

  /** Install rule + strategy into a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.installStrategy(spark, TopKStrategy)
    GraftSqlBridge.installOptimizerRule(spark, TopKRewrite)
  }
}
