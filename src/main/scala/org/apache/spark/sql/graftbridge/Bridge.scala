package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` to sql-api (backed by ColumnNode); the catalyst
  * Expression bridge `classic.ExpressionUtils` is `private[sql]`. This
  * shim lives under org.apache.spark.sql solely to re-export the two
  * conversions custom Catalyst expressions need. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until queued listener events are delivered (listenerBus is
    * `private[spark]`) — used by the bench to attribute task IO metrics
    * to the query that just ran. */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)

  /** DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * `private[sql]`) — used by plan-shape tests to EXECUTE a subtree of
    * an optimized plan (e.g. a Window operator's child) and measure its
    * actual key distribution. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
