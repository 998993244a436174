package graft.sql

import graft.ops.TableOps
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StructField
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** The SQL WRITE surface of the graft catalog — `INSERT INTO`,
  * `INSERT OVERWRITE`, `MERGE INTO`, `UPDATE`, `DELETE` over
  * `catalog.db.table`, mapped onto the engine's commit protocol
  * ([[TableOps.upsert]] / [[TableOps.insertOverwriteTable]] /
  * [[TableOps.applyChanges]] / [[TableOps.updateWhere]] /
  * [[TableOps.deleteWhere]]). This is the reference's single
  * most-used operation — the Hudi upsert write
  * (create_hudi_tables.py:218-221, incremental_etl_orders.py:448-451)
  * — expressed the Spark-native way: plain SQL DML against a
  * `CatalogPlugin`, no Scala API in sight.
  *
  * Architecture (the Delta shape): INSERT goes through the DSv2
  * V1-write fallback ([[GraftTable.newWriteBuilder]] →
  * `InsertableRelation`), because the engine's writer is itself a
  * whole-DataFrame planner (partition-scoped COW rewrite), not a
  * per-task sink. MERGE / UPDATE / DELETE are intercepted at post-hoc
  * resolution ([[GraftDmlResolution]]) — after the analyzer resolved
  * every condition and assignment against the real attributes — and
  * converted to eager [[LeafRunnableCommand]]s, exactly where Delta's
  * `PreprocessTableMerge` sits. No row-level-operation scaffolding is
  * planned by Spark; the engine's own key-merge machinery (which
  * already IS a distributed merge-on-read join) does the work.
  */
object GraftDml {

  /** The writable data columns of a graft table: its schema minus the
    * engine-stamped commit column (always engine-generated — a write
    * that supplies `_commit_ts` is either a snapshot re-insert, where
    * dropping it is the obviously-right thing, or a mistake).
    */
  private[sql] def dataColumns(gt: GraftTable): Seq[StructField] =
    gt.schema().filterNot(_.name == graft.tables.KeyedTable.CommitCol)

  /** Align an incoming frame to the table's data columns — by NAME
    * when every data column is present (case-insensitive, the SQL
    * default), by POSITION only for the `INSERT ... VALUES` shape
    * (matching arity AND no name overlap with the table — a frame
    * whose names PARTIALLY overlap is a typo'd or reordered SELECT,
    * and positionally mapping it would silently cross-assign columns;
    * review r15 finding), refused loudly otherwise. Types cast per
    * column — under ANSI mode an overflowing insert fails instead of
    * wrapping.
    *
    * EXTRA by-name columns ride along (appended after the table
    * columns): the engine evolves schemas additively ON WRITE (Hudi
    * semantics — the contract [[GraftCatalog.alterTable]]'s
    * ADD-COLUMNS refusal points at), so `INSERT ... SELECT *` from a
    * wider source grows the table, NULL-backfilled for old rows.
    */
  private[sql] def align(gt: GraftTable, data: DataFrame): DataFrame = {
    val cols = dataColumns(gt)
    val incoming = data.drop(graft.tables.KeyedTable.CommitCol)
    val byName = incoming.columns.map(c => c.toLowerCase -> c).toMap
    val tableNames = cols.map(_.name.toLowerCase).toSet
    if (cols.forall(f => byName.contains(f.name.toLowerCase))) {
      val extras = incoming.columns.toIndexedSeq
        .filterNot(c => tableNames.contains(c.toLowerCase))
      incoming.select(cols.map(f =>
        col(byName(f.name.toLowerCase)).cast(f.dataType).as(f.name)) ++
        extras.map(col): _*)
    } else if (incoming.columns.length == cols.length &&
        !incoming.columns.exists(c => tableNames.contains(c.toLowerCase))) {
      incoming.select(incoming.columns.toIndexedSeq.zip(cols).map {
        case (in, f) => col(in).cast(f.dataType).as(f.name)
      }: _*)
    } else {
      throw new IllegalArgumentException(
        s"cannot write to graft table ${gt.name()}: incoming columns " +
          s"[${incoming.columns.mkString(", ")}] do not cover the " +
          s"table's data columns [${cols.map(_.name).mkString(", ")}] " +
          "by name, and positional mapping is only applied when NO " +
          "incoming name matches a table column (the VALUES shape) — " +
          "a partial overlap is treated as a mistyped or reordered " +
          "SELECT, not mapped silently")
    }
  }

  /** `INSERT INTO` = keyed upsert (the table IS keyed — Hudi's default
    * write operation for a primary-keyed table); `INSERT OVERWRITE` =
    * whole-table replace commit (Hudi `insert_overwrite_table`).
    */
  private[sql] def insert(gt: GraftTable, data: DataFrame,
      overwrite: Boolean): Unit = {
    require(gt.asOf.isEmpty,
      s"cannot write to ${gt.name()} VERSION AS OF '${gt.asOf.get}' — " +
        "time-travel reads are immutable")
    val spark = data.sparkSession
    val aligned = align(gt, data)
    if (overwrite) TableOps.insertOverwriteTable(spark, gt.keyed, aligned)
    else TableOps.upsert(spark, gt.keyed, aligned)
    ()
  }

  /** Rebind a resolved condition/assignment expression to NAME-based
    * resolution so it can be applied to the engine's own snapshot frame
    * (whose attribute ids differ from the analyzer's relation). Sound
    * for single-table DML (UPDATE/DELETE): every attribute belongs to
    * the one target relation, so bare names are unambiguous.
    */
  private[sql] def unbind(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private[sql] def graftTarget(plan: LogicalPlan): Option[
      (DataSourceV2Relation, GraftTable)] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        (r, r.table.asInstanceOf[GraftTable])
    }

  private def requireWritable(gt: GraftTable, op: String): Unit =
    require(gt.asOf.isEmpty,
      s"$op into ${gt.name()} VERSION AS OF '${gt.asOf.get}' — " +
        "time-travel reads are immutable")
}

/** Post-hoc resolution rule: converts analyzer-resolved MERGE / UPDATE
  * / DELETE over a graft-catalog target into eager commands against
  * the engine. Runs AFTER the main resolution batch (so conditions and
  * assignments are fully resolved, and [[GraftTableSubstitution]] has
  * already grafted the snapshot plan into the SOURCE side) and BEFORE
  * CheckAnalysis / the optimizer (so Spark's row-level-operation
  * machinery — which this table deliberately does not implement — is
  * never consulted).
  */
case class GraftDmlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case m: MergeIntoTable if m.resolved &&
          GraftDml.graftTarget(m.targetTable).isDefined =>
        GraftMergeCommand(m)
      case u: UpdateTable if u.resolved &&
          GraftDml.graftTarget(u.table).isDefined =>
        GraftUpdateCommand(u)
      case d: DeleteFromTable if d.resolved &&
          GraftDml.graftTarget(d.table).isDefined =>
        GraftDeleteCommand(d)
    }
}

/** `MERGE INTO target USING source ON cond WHEN ...` against a graft
  * table, executed as ONE change-capture plan + one
  * [[TableOps.applyChanges]] call:
  *
  *   1. The target side is the engine's substituted snapshot plan
  *      re-aliased to the analyzer's attribute ids (same mechanism as
  *      the read path), so every resolved clause expression binds
  *      as-is — no name-based rebinding, no ambiguity with source
  *      columns of the same name.
  *   2. Target and source join on the merge condition — with the join
  *      TYPE chosen from the clause set (inner when only MATCHED
  *      clauses exist, right-outer for MATCHED+INSERT, left-outer for
  *      MATCHED+NOT-MATCHED-BY-SOURCE, full-outer only when all three
  *      appear): at 100 TB the difference between an inner and a full
  *      outer join on the key is the whole game.
  *   3. One projection evaluates every clause (first-match-wins via a
  *      single CaseWhen per output column, exactly SQL's clause-order
  *      contract), emitting `I`/`U`/`D` ops; rows no clause claims are
  *      dropped BEFORE the write, so an upsert touches only the
  *      partitions the merge actually changed.
  *   4. [[TableOps.applyChanges]] applies the ops under the table's
  *      own key-merge protocol. Several source rows matching one
  *      target key resolve by GREATEST PRECOMBINE (documented Hudi
  *      `preCombine` semantics — deterministic — rather than the ANSI
  *      multi-match error).
  *
  * Schema evolution via MERGE (`WHEN NOT MATCHED THEN INSERT` of new
  * columns) is not supported — evolve with the Scala API first.
  */
case class GraftMergeCommand(merge: MergeIntoTable)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (rel, gt) = GraftDml.graftTarget(merge.targetTable).get
    require(gt.asOf.isEmpty,
      s"MERGE into ${gt.name()} VERSION AS OF — time travel is immutable")

    // target = snapshot plan re-aliased to the analyzer's attribute
    // ids; source = the resolved source plan as-is (graft sources were
    // substituted during resolution)
    val targetPlan = GraftTableSubstitution.substituted(rel)
    val tgt = ColumnBridge.ofRows(spark, targetPlan)
      .withColumn("__graft_t", lit(true))
    val src = ColumnBridge.ofRows(spark, merge.sourceTable)
      .withColumn("__graft_s", lit(true))

    val joinType =
      (merge.notMatchedActions.nonEmpty,
        merge.notMatchedBySourceActions.nonEmpty) match {
        case (true, true) => "full_outer"
        case (true, false) => "right_outer"
        case (false, true) => "left_outer"
        case (false, false) => "inner"
      }
    val joined = tgt.join(src, ColumnBridge.column(merge.mergeCondition),
      joinType)

    val matched = col("__graft_t").isNotNull && col("__graft_s").isNotNull
    val srcOnly = col("__graft_t").isNull && col("__graft_s").isNotNull
    val tgtOnly = col("__graft_t").isNotNull && col("__graft_s").isNull

    val byExprId = rel.output.map(a => a.exprId -> a.name).toMap
    def assignedName(key: Expression): String = key match {
      case a: AttributeReference =>
        byExprId.getOrElse(a.exprId, a.name)
      case other => throw new UnsupportedOperationException(
        s"MERGE into ${gt.name()}: only top-level column assignments " +
          s"are supported, got ${other.sql}")
    }
    val dataCols: Seq[Attribute] =
      rel.output.filterNot(_.name == graft.tables.KeyedTable.CommitCol)

    // one branch per clause, in SQL clause order within each
    // (disjoint) row group; each branch yields (guard, op, col→value)
    case class Branch(guard: Column, op: String,
        values: Map[String, Column])
    def cond(c: Option[Expression]): Column =
      c.map(ColumnBridge.column).getOrElse(lit(true))
    def updateValues(assignments: Seq[Assignment]): Map[String, Column] =
      assignments.map(a =>
        assignedName(a.key) -> ColumnBridge.column(a.value)).toMap
    def branchesOf(group: Column, actions: Seq[MergeAction],
        insertRow: Boolean): Seq[Branch] = actions.map {
      case UpdateAction(c, assignments, _) =>
        Branch(group && cond(c), "U", updateValues(assignments))
      case DeleteAction(c) => Branch(group && cond(c), "D", Map.empty)
      case InsertAction(c, assignments) =>
        val vals = updateValues(assignments)
        val required = (gt.keyed.recordKey ++ gt.keyed.partitionBy :+
          gt.keyed.precombineKey).distinct
        val missing = required.filterNot(vals.contains)
        require(missing.isEmpty,
          s"MERGE INSERT into ${gt.name()} must assign the record key, " +
            s"partition, and precombine columns; missing: " +
            missing.mkString(", "))
        Branch(group && cond(c), "I", vals)
      case other => throw new UnsupportedOperationException(
        s"MERGE into ${gt.name()}: unsupported action $other")
    }
    val branches =
      branchesOf(matched, merge.matchedActions, insertRow = false) ++
        branchesOf(srcOnly, merge.notMatchedActions, insertRow = true) ++
        branchesOf(tgtOnly, merge.notMatchedBySourceActions,
          insertRow = false)
    require(branches.nonEmpty, "MERGE with no WHEN clauses")

    val opCol = branches.foldRight(lit(null).cast("string")) {
      (b, rest) => when(b.guard, lit(b.op)).otherwise(rest)
    }
    def valueCol(a: Attribute): Column = {
      val tgtVal = ColumnBridge.column(a)
      branches.foldRight(tgtVal) { (b, rest) =>
        // D keeps the target row (only its identity is consumed); an
        // INSERT branch has no target value to fall back to — an
        // unassigned non-required column inserts NULL, SQL's default
        val v = b.values.getOrElse(a.name,
          if (b.op == "I") lit(null).cast(a.dataType) else tgtVal)
        when(b.guard, v).otherwise(rest)
      }
    }

    val changes = joined
      .select(dataCols.map(a => valueCol(a).as(a.name)) :+
        opCol.as("_graft_op"): _*)
      .filter(col("_graft_op").isNotNull)
    TableOps.applyChanges(spark, gt.keyed, changes, opCol = "_graft_op")
    Nil
  }
}

/** `UPDATE cat.db.t SET ... WHERE ...` → [[TableOps.updateWhere]]
  * (stats-pruned read of the matched rows, partition-scoped COW
  * rewrite). Single-table DML, so resolved expressions rebind to the
  * engine's snapshot frame by bare column name.
  */
case class GraftUpdateCommand(update: UpdateTable)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, gt) = GraftDml.graftTarget(update.table).get
    require(gt.asOf.isEmpty,
      s"UPDATE of ${gt.name()} VERSION AS OF — time travel is immutable")
    val set = update.assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => throw new UnsupportedOperationException(
          s"UPDATE ${gt.name()}: only top-level column assignments are " +
            s"supported, got ${other.sql}")
      }
      name -> GraftDml.unbind(a.value)
    }.toMap
    val pred = update.condition.map(GraftDml.unbind).getOrElse(lit(true))
    TableOps.updateWhere(spark, gt.keyed, pred, set)
    Nil
  }
}

/** `DELETE FROM cat.db.t WHERE ...` → [[TableOps.deleteWhere]] (the
  * matched row identities deleted through the table's own tombstone
  * commit). An unconditioned DELETE deletes every row — same contract
  * as SQL.
  */
case class GraftDeleteCommand(delete: DeleteFromTable)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (_, gt) = GraftDml.graftTarget(delete.table).get
    require(gt.asOf.isEmpty,
      s"DELETE from ${gt.name()} VERSION AS OF — time travel is immutable")
    TableOps.deleteWhere(spark, gt.keyed, GraftDml.unbind(delete.condition))
    Nil
  }
}
