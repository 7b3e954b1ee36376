package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge for lifting a Catalyst Expression into the public Column API:
  * `classic.ExpressionUtils` is private[sql] in Spark 4, so the engine's
  * custom expressions (graft.plans) go through this one-file shim — the
  * standard pattern Spark extension libraries use.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register the engine's SQL functions on a LIVE session (sessionState
    * is private[sql]); the builder-time path is
    * `withExtensions(new graft.plans.GraftExtensions)`.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Lift a custom logical plan into a DataFrame (`Dataset.ofRows` is
    * private[sql]).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a LIVE session via the public
    * `ExperimentalMethods` hook; the builder-time path is
    * `withExtensions(new graft.plans.GraftExtensions)`.
    */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }

  /** Idempotently add an optimizer rule to a LIVE session via the public
    * `ExperimentalMethods` hook (runs in the "User Provided Optimizers"
    * batch, after the built-in batches); the builder-time path is
    * `withExtensions(new graft.plans.GraftExtensions)`.
    */
  def addOptimizerRule(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule)) {
      exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }

  /** Drain the async listener bus so a just-finished job's task metrics
    * have reached registered listeners (`listenerBus` is private[spark];
    * this file lives in the org.apache.spark tree precisely for shims
    * like this).
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Number of listeners currently registered on the bus — lets specs
    * prove scoped listeners (ops.QueryMetrics) detach.
    */
  def listenerCount(spark: SparkSession): Int =
    spark.sparkContext.listenerBus.listeners.size()
}
