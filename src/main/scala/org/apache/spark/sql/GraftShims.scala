package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. In Spark 4 the Column API is decoupled
  * from Catalyst (Spark Connect split) and the converters live behind
  * `private[sql]`; third-party engines that ship native Expressions
  * (this one, Sedona, frameless, …) expose them via a same-package shim.
  * Nothing else of Spark's internals is touched. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
