package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.{Column, DataFrame}

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

  /** Re-plan a batch DataFrame with its leaf relations flagged
    * `isStreaming = true` — what a V1 streaming `Source.getBatch` must
    * return (the micro-batch engine asserts it; Delta's source does the
    * same with its own createDataFrame). `isStreaming` propagates up
    * from leaves, so flipping the leaf relations suffices.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case rdd: LogicalRDD if !rdd.isStreaming =>
        rdd.copy(isStreaming = true)(spark, None, None)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }
}
