package graft.plans

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

/** Opt-in approximate query processing as a Catalyst optimizer rule: a
  * `COUNT(DISTINCT approx_hint(c))` is rewritten at OPTIMIZATION time into
  * Spark's native HyperLogLog++ aggregate — one mergeable sketch per
  * partition instead of the exact two-phase distinct (which shuffles every
  * distinct (group, value) pair). At 100 TB that is the difference between
  * a shuffle proportional to the distinct-pair count and one proportional
  * to |groups| × sketch_size.
  *
  * The hint is scoped per EXPRESSION, not per session: a config flag would
  * leak across the lazily-evaluated queries that share the session (conf
  * is read at action time, long after the query-building function
  * returned), silently corrupting exact queries planned later. A marker
  * expression travels inside the one plan it annotates.
  *
  * Degradation is graceful by construction: without the rule installed the
  * marker is a codegen'd identity, so the query still runs — exactly, just
  * without the speedup.
  */
case class ApproxDistinctHint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override def prettyName: String = "graft_approx_hint"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The rewrite: `count(distinct graft_approx_hint(c))` → `hll++(c)` (rsd
  * 5%); any marker not under a distinct count is stripped to its child.
  * Registered via [[GraftExtensions]] (builder time) or
  * [[ApproxDistinct.install]] (live session, idempotent).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val RelativeSD = 0.05

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ae: AggregateExpression if ae.isDistinct =>
      ae.aggregateFunction match {
        case Count(Seq(ApproxDistinctHint(c))) =>
          ae.copy(aggregateFunction = HyperLogLogPlusPlus(c, RelativeSD),
            isDistinct = false)
        case _ => ae
      }
    case ApproxDistinctHint(c) => c
  }
}

object ApproxDistinct {
  /** Mark one aggregation input as approximation-tolerant. */
  def hint(c: Column): Column =
    GraftShims.column(ApproxDistinctHint(GraftShims.expression(c)))

  /** Idempotently install the rewrite on a live session. */
  def install(spark: SparkSession): Unit =
    GraftShims.addOptimizerRule(spark, ApproxDistinctRewrite)
}
