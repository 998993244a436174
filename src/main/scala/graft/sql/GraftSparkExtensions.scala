package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** `spark.sql.extensions=graft.sql.GraftSparkExtensions` — installs
  * the analysis rule that makes [[GraftCatalog]] tables executable.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(session => GraftTableSubstitution(session))
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
  */
case class GraftTableSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
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
