package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/**
 * Minimal bridge from a Catalyst [[Expression]] to a public [[Column]]
 * and back. Spark 4 moved Column onto ColumnNode and made the
 * expression constructors `private[sql]`, so a library adding a native
 * expression needs this one-file shim inside the `org.apache.spark.sql`
 * namespace — the standard pattern for Catalyst-extending libraries.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native function on a LIVE session (the
    * SparkSessionExtensions path only applies at builder time; the
    * registry itself is `private[sql]`). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
