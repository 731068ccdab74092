/* Bridge into Spark's private[sql] scope — the sanctioned pattern for
 * third-party Catalyst extensions that need Expression ⇄ Column
 * conversion (same access the built-in functions use). No Spark
 * internals are reimplemented here. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
