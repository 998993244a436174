package graft.loaders

import graft.ops.{Increment, IncrementalReader, TableOps}
import graft.tables.{CheckpointStore, KeyedTable}
import org.apache.spark.sql.SparkSession

/** Source registry + dispatcher — the reference's "loaders payload" and
  * `Loaders.load` (incremental_etl_orders.py:27-47,393-412; D3 in
  * SURVEY.md §2k): each source declares how it is consumed
  * (FULL snapshot vs INC incremental) and the temp-view name under which
  * SQL sees it. Only source type HUDI is implemented in the reference
  * (DYNAMODB is a declared enum value only, :31); here the analog is the
  * engine's keyed parquet table.
  */
object SourceMode extends Enumeration {
  val FULL, INC = Value
}

final case class SourceSpec(
    table: KeyedTable,
    sparkTableName: String,
    mode: SourceMode.Value)

object Loaders {

  /** Load every source, register it as a temp view (S6), and return the
    * checkpoints to persist after the pipeline's sink write succeeds
    * (at-least-once contract — see [[graft.ops.IncrementalReader]]).
    */
  def load(
      spark: SparkSession,
      specs: Seq[SourceSpec],
      store: CheckpointStore): Seq[Increment] =
    specs.map { spec =>
      spec.mode match {
        case SourceMode.FULL =>
          val df = TableOps.snapshot(spark, spec.table)
          df.createOrReplaceTempView(spec.sparkTableName)
          Increment(df, None)
        case SourceMode.INC =>
          val inc = new IncrementalReader(store).read(spark, spec.table)
          inc.df.createOrReplaceTempView(spec.sparkTableName)
          inc
      }
    }
}
