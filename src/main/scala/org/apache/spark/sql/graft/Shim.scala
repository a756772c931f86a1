package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made `Column` a ColumnNode wrapper and scoped the
  * Expression↔Column converters `private[sql]`; this object lives inside
  * `org.apache.spark.sql` to re-export exactly the two conversions the
  * library needs (the standard extension-library pattern).
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
