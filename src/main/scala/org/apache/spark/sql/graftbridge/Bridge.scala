package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Access bridge for `private[sql]` conversion helpers — the standard
 * pattern for libraries that define native Catalyst expressions and
 * need to wrap them as public `Column`s (Spark 4 moved Column to a
 * ColumnNode wrapper; `classic.ExpressionUtils` does the conversion
 * but is sql-private).
 */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
