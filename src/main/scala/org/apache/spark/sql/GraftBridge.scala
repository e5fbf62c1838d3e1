/*
 * Bridge into Spark's private[sql] Column <-> Expression converters.
 * Spark 4.x made the Column(expr) constructor internal; extensions that
 * define custom Catalyst Expressions need this one-file shim.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
