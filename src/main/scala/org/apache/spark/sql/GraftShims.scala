package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column<->Expression conversions (Spark 4.x moved
  * them behind `org.apache.spark.sql.classic.ExpressionUtils`). Standard
  * pattern for Catalyst-extension libraries: one tiny accessor object in the
  * `org.apache.spark.sql` package, nothing else lives here.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Block until queued listener events are delivered (`listenerBus` is
    * `private[spark]`) — lets metrics collectors read complete task totals. */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
