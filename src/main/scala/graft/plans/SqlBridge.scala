// Bridge into Spark's package-private classic Column/Expression converters.
// Standard technique for libraries shipping native Catalyst expressions
// (the public API intentionally hides Expression since the Connect split).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Observation row accessors (`getRowOrEmpty`/`getRow` are private[sql];
    * the Map-returning public `get`/`getOrEmpty` NPE on the schema-less
    * timeout-fallback row in 4.1.2, so positional Row access it is).
    */
  def observationRow(obs: Observation): Option[Row] = obs.getRowOrEmpty
  def observationRowBlocking(obs: Observation): Row = obs.getRow

  /** True when no Dataset persist is registered — the cache-lifecycle
    * assertion surface (CacheManager is private[sql]).
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
