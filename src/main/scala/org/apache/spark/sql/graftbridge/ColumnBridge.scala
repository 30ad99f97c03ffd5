package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the sanctioned extension-point pattern for registering custom
  * Catalyst expressions (graft.functions.DotProduct) without a full
  * FunctionRegistry round-trip. Nothing else from the internal API is
  * touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` Dataset.ofRows — lets graft's SQL
  * INSERT command materialize its (still-unanalyzed) source plan as a
  * DataFrame at run time, exactly what Spark's own RunnableCommands
  * do. Nothing else from the internal API is touched. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
