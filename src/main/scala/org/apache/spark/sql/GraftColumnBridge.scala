package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made the public `Column` a tree of
  * `ColumnNode`s and hid the catalyst conversion behind
  * `private[sql] classic.ExpressionUtils`; third-party Catalyst expressions
  * (graft.functions.*) need exactly that conversion to expose a Column API
  * without going through the session function registry. Same-package bridge
  * object — the established pattern for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
