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

  /** A DataFrame over an already-analyzed LogicalPlan (Spark's
    * `Dataset.ofRows`, `private[sql]`) — the DML command path builds
    * plans from analyzer-resolved fragments whose attribute ids must
    * survive verbatim.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A V1 [[org.apache.spark.sql.execution.streaming.runtime.StreamingRelation]]
    * over [[graft.streaming.CommitStreamProvider]] carrying the GIVEN
    * output attributes — what the catalog's streaming substitution rule
    * grafts in place of a `StreamingRelationV2` so
    * `spark.readStream.table("cat.db.t")` reaches the engine's
    * commit-offset source with references above the relation unmoved.
    */
  def commitStreamRelation(spark: org.apache.spark.sql.SparkSession,
      options: Map[String, String],
      schema: org.apache.spark.sql.types.StructType,
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      sourceName: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      className = classOf[graft.streaming.CommitStreamProvider].getName,
      userSpecifiedSchema = Some(schema),
      options = options)
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
      ds, sourceName, output)
  }

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
