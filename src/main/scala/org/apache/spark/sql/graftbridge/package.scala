package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Column ⇄ Expression bridge.
  *
  * Spark 4 made `Column` wrap a connect-compatible `ColumnNode` and
  * hid the Expression accessors behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala). Libraries that ship custom Catalyst
  * expressions with a Column-level API (Delta, Sedona, Frameless all
  * do the same) bridge via a one-file object in the
  * `org.apache.spark.sql` namespace. This is the entire shim: two
  * delegating defs, no behavior.
  */
package object graftbridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a (classic-session) Column to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
