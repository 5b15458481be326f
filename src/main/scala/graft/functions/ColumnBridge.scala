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
}
