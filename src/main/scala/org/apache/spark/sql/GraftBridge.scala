package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; classic expressions convert via
  * `org.apache.spark.sql.classic.ExpressionUtils`). Compiling this object
  * inside the `org.apache.spark.sql` package is the standard ecosystem
  * technique for exposing custom Catalyst expressions as Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
