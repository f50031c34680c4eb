package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions — the
  * Column↔Expression converters are `private[sql]` in Spark 4, so this
  * one-file shim lives inside the sql package to expose them to graft
  * (standard extension-library pattern; no behavior added). */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
