package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Expression<->Column conversion
  * (Spark 4 moved it behind `org.apache.spark.sql.classic`). Lives in the
  * spark.sql namespace solely to satisfy the access modifier; the single
  * consumer is graft's custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to its Catalyst expression. The lazy
    * [[expression]] wrapper is only unwrapped when the Column flows
    * through the Dataset API; expressions embedded directly in a custom
    * LogicalPlan need the real converted tree (e.g. `UnresolvedAttribute`,
    * catalyst `SortOrder`) so the analyzer can resolve them in place. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Construct a DataFrame over a (possibly custom) logical plan —
    * `Dataset.ofRows` is `private[sql]` in Spark 4's classic module. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a native-expression builder into a live session's function
    * registry (`sessionState` is `private[sql]`, hence bridged here). */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
