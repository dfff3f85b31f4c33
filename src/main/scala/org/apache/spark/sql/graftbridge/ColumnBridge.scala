package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the supported
  * wrapper (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This bridge lives inside the `org.apache.spark.sql`
  * package namespace solely to re-export Column <-> Expression conversion
  * for graft's custom Catalyst expressions. No other internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
