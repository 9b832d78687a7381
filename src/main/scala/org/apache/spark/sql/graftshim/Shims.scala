package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved the Column↔Expression
  * conversions behind `org.apache.spark.sql.classic` (Connect refactor);
  * this one-file shim lives under org.apache.spark.sql so the rest of the
  * engine never touches a private[sql] API directly. */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
