package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** `spark.sql.extensions=graft.sql.GraftSparkExtensions` — installs
  * the rules that make [[GraftCatalog]] tables executable:
  * [[GraftTableSubstitution]] (batch + streaming reads) at resolution
  * and [[GraftDmlResolution]] (MERGE / UPDATE / DELETE) at post-hoc.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => GraftTableSubstitution(session))
    ext.injectPostHocResolutionRule(session => GraftDmlResolution(session))
  }
}

/** Replaces a resolved [[GraftTable]] relation with the engine's
  * snapshot LogicalPlan (the Delta `DeltaAnalysis` shape: the catalog
  * resolves identity + schema, an analyzer rule grafts in the real
  * read plan). Substituting at ANALYSIS time means the whole
  * optimizer pipeline then runs over the substituted plan — predicate
  * pushdown crosses the snapshot's unions/projections down to the
  * parquet scans, column pruning narrows ReadSchema, AQE plans the
  * real shuffles. The top-level Project re-aliases the snapshot's
  * output to the relation's attribute ids so references above the
  * relation stay bound.
  *
  * WRITE TARGETS are left alone: the target relation under a
  * `MERGE INTO` / `UPDATE` / `DELETE` is a plan CHILD, and
  * substituting it would erase the table identity the write needs —
  * those nodes convert whole at post-hoc ([[GraftDmlResolution]]),
  * which substitutes the target itself where it needs a read plan.
  * (`INSERT INTO`'s target is not a plan child, so it is naturally
  * untouched and flows to the DSv2 V1-write fallback.)
  *
  * A streaming read (`spark.readStream.table("cat.db.t")`) arrives as
  * a [[StreamingRelationV2]]; it is replaced with a V1
  * `StreamingRelation` over the engine's commit-offset source
  * ([[graft.streaming.CommitStreamSource]] — offsets are published
  * commits, exactly-once, admission-controlled), so the CDC feed the
  * reference's incremental consumer lives on
  * (incremental_etl_orders.py:217-227) is reachable without any Scala.
  */
case class GraftTableSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // write-target relations (plan children of DML nodes) stay intact
    // until GraftDmlResolution converts the whole command
    val writeTargets = AttributeSet(plan.collect {
      case m: MergeIntoTable => m.targetTable
      case u: UpdateTable => u.table
      case d: DeleteFromTable => d.table
    }.flatMap(_.collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        r.output
    }.flatten))
    plan.resolveOperatorsUp {
      // MERGE targets must NOT report ACCEPT_ANY_SCHEMA: the analyzer
      // skips every clause's reference resolution for such targets
      // (`skipSchemaResolution`), leaving the merge permanently
      // unresolved. Flip the target to the strict-schema variant of
      // the same table (same attribute ids — only capabilities change)
      // so the clauses resolve; INSERT keeps the lenient variant.
      case m: MergeIntoTable if !m.resolved =>
        m.copy(targetTable = m.targetTable.transform {
          case r: DataSourceV2Relation
              if r.table.isInstanceOf[GraftTable] &&
                !r.table.asInstanceOf[GraftTable].strictSchema =>
            r.copy(table = r.table.asInstanceOf[GraftTable]
              .copy(strictSchema = true))
        })
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
          r.outputSet.intersect(writeTargets).isEmpty =>
        GraftTableSubstitution.substituted(r)
      case s: StreamingRelationV2 if s.table.isInstanceOf[GraftTable] =>
        val gt = s.table.asInstanceOf[GraftTable]
        require(gt.asOf.isEmpty,
          s"cannot stream ${gt.qualifiedName} VERSION AS OF — the " +
            "commit feed is inherently current")
        val t = gt.keyed
        import scala.jdk.CollectionConverters._
        val opts = Map(
          "table.name" -> t.name,
          "table.path" -> t.path,
          "table.recordKey" -> t.recordKey.mkString(","),
          "table.precombine" -> t.precombineKey) ++
          (if (t.partitionBy.nonEmpty)
            Map("table.partitionBy" -> t.partitionBy.mkString(","))
          else Map.empty) ++
          s.extraOptions.asCaseSensitiveMap().asScala
        org.apache.spark.sql.graft.ColumnBridge.commitStreamRelation(
          spark, opts, s.schema, s.output,
          s"graft-commits[${gt.qualifiedName}]")
    }
  }
}

object GraftTableSubstitution {

  /** The engine's snapshot plan for a resolved graft relation,
    * re-aliased to the relation's own attribute ids (references above
    * stay bound). Shared by the read substitution and the MERGE
    * command's target side.
    */
  def substituted(r: DataSourceV2Relation): LogicalPlan = {
    val gt = r.table.asInstanceOf[GraftTable]
    val sub = gt.snapshotDf.queryExecution.analyzed
    val byName = sub.output.map(a => a.name -> a).toMap
    Project(r.output.map { target =>
      val src = byName.getOrElse(target.name, throw new
        IllegalStateException(
          s"graft table ${gt.qualifiedName}: snapshot plan lost " +
            s"column '${target.name}' between resolution and " +
            "substitution"))
      Alias(src, target.name)(exprId = target.exprId,
        qualifier = target.qualifier)
    }, sub)
  }
}
