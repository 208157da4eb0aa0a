package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark internals that are `private[sql]` in Spark 4
  * (Column ↔ catalyst Expression conversion moved behind
  * `org.apache.spark.sql.classic.ExpressionUtils` when Column became
  * ColumnNode-backed). Standard extension-library pattern: live inside the
  * `org.apache.spark.sql` namespace to reach them.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
