package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the library's native Catalyst
  * expressions. Spark 4 made `Column` plan-agnostic (ColumnNode), so
  * wrapping a catalyst `Expression` goes through the `classic`
  * converter, which is `private[sql]` — hence this one-object shim in
  * the `org.apache.spark.sql` namespace (the standard pattern for
  * libraries shipping custom expressions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the (async) listener bus — lets tests that count scheduler
    * events read a final value (`private[spark]` on SparkContext).
    */
  def waitListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Stable per-session UUID (`private[sql]` on the classic session) —
    * used as a cache key that can't alias after a session is GC'd.
    */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => System.identityHashCode(other).toString
  }
}
