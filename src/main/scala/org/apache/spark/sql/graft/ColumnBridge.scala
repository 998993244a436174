package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) — the standard
  * extension-library pattern for building a [[Column]] from a raw
  * Catalyst [[Expression]] when no public `functions._` constructor
  * exists (here: a single multi-column `IN` over struct literals for
  * O(1)-depth partition pruning, [[graft.ops.TableOps]]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
