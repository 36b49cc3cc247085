// Bridge into Spark's package-private classic Column/Expression converters.
// Standard technique for libraries shipping native Catalyst expressions
// (the public API intentionally hides Expression since the Connect split).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
