package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` seam a whole-operator extension needs:
  * turning a hand-built `LogicalPlan` back into a public `DataFrame`.
  * Placing this object under `org.apache.spark.sql` is the standard
  * pattern every Spark extension library uses for exactly this hop
  * (`Dataset.ofRows` is package-private by design; the planner
  * strategy and the logical node themselves use only public
  * extension APIs).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Expression ↔ Column hops for the engine's INTERNAL folds — lets a
    * native aggregate run on ANY session (the foreign-table tails run
    * under whatever session the user owns; function-registry
    * registration is only guaranteed on extensions-configured ones). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Whether the session's planner already carries `strategy` — covers
    * BOTH registration paths (extension-injected strategies and
    * `experimental.extraStrategies`), so callers can self-heal without
    * double-registering on an extensions-configured session.
    */
  def hasStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Boolean =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.planner.strategies.contains(strategy)
}
