package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst extension: rewrite `EXCEPT [DISTINCT]` into a single
  * grouped aggregation over the unioned inputs with per-branch
  * presence markers.
  *
  * This is the strategy the reference engine compiles its q005 EXCEPT
  * chain into (reference: results/q005/workers-1/explain.txt:25-37 — one
  * Aggregate over all branches with `count_119 >= 1 AND count_120 = 0`
  * filters), where Catalyst's `ReplaceExceptWithAntiJoin` plans one
  * anti-join per EXCEPT. For an N-branch chain the rewrite needs ONE
  * shuffle instead of N, which is the shape that wins at scale.
  *
  * Example: `SELECT a FROM l EXCEPT SELECT a FROM r` becomes
  * {{{
  *   Project a
  *     Filter (__in0 = 1 AND __in1 = 0)
  *       Aggregate [a] [a, max(if b=0) AS __in0, max(if b=1) AS __in1]
  *         Union
  *           Project [a, 0 AS __graft_b]  (l)
  *           Project [a, 1 AS __graft_b]  (r)
  * }}}
  * NULL grouping keys compare equal under GROUP BY, matching EXCEPT's
  * null-safe set semantics. Disable with
  * `spark.sql.graft.rewriteExcept=false`.
  */
object RewriteExceptAsAggregate extends Rule[LogicalPlan] {

  private val marker = "__graft_b"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.sql.graft.rewriteExcept", "true").toBoolean) return plan
    plan.resolveOperatorsUp {
      case Except(left, right, false) if left.resolved && right.resolved =>
        val lTag = Project(
          left.output :+ Alias(Literal(0), marker)(), left)
        // align right's columns to left's names positionally (EXCEPT
        // matches by position, not name)
        val rTag = Project(
          right.output.zip(left.output).map { case (r, l) => Alias(r, l.name)() } :+
            Alias(Literal(1), marker)(), right)
        val union = Union(Seq(lTag, rTag))
        val keys = union.output.init
        val b = union.output.last
        def presence(tag: Int, name: String) = Alias(
          Max(CaseWhen(Seq((EqualTo(b, Literal(tag)), Literal(1))), Literal(0)))
            .toAggregateExpression(), name)()
        val in0 = presence(0, "__in0")
        val in1 = presence(1, "__in1")
        val agg = Aggregate(keys, (keys :+ in0 :+ in1).toSeq, union)
        val filtered = Filter(
          And(EqualTo(in0.toAttribute, Literal(1)), EqualTo(in1.toAttribute, Literal(0))),
          agg)
        // restore the original Except output attribute ids so parents
        // still resolve
        Project(
          keys.zip(left.output).map { case (k, o) =>
            Alias(k, o.name)(exprId = o.exprId)
          }, filtered)
    }
  }
}

/** SparkSessionExtensions entry point (wired via
  * `spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => RewriteExceptAsAggregate)
    e.injectPlannerStrategy(_ => GroupedTopKStrategy)
  }
}
