package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's custom Catalyst
  * expressions. Spark 4 keeps these converters `private[sql]`
  * (sql/classic/columnNodeSupport.scala), so the glue lives in an
  * `org.apache.spark.sql` subpackage — the standard extension-library
  * seam; everything engine-side stays in the public `graft.*` packages.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
