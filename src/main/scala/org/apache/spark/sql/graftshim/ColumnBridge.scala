package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge.
  *
  * Spark 4 made `Column` representation-agnostic; the converters live in
  * `classic.ExpressionUtils`, which is `private[sql]`. This shim re-exports
  * the two calls graft's custom expressions need. It is the only file in
  * the repo inside Spark's namespace, and it contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
