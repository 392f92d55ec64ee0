package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * conventional hook for libraries contributing native Catalyst expressions
  * (Column construction from Expression moved behind ColumnNode in Spark 4).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a constructed logical plan (`Dataset.ofRows` moved
    * `private[sql]`) — used by the delta-accumulating aggregate maintainer
    * to evaluate its auxiliary partial-aggregate plan. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
