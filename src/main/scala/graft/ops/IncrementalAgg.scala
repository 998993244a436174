package graft.ops

import graft.tables.{Checkpoint, CheckpointStore, KeyedTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained aggregate table — materialized-view
  * maintenance over an APPEND-ONLY source: per-group
  * `(cnt, sum_v, min_v, max_v)` kept in its own keyed table and
  * refreshed at O(increment) cost, never O(source). The warehouse
  * pattern this replaces at 100 TB: a dashboard aggregate over a
  * 10¹²-row fact table that today re-scans everything per refresh;
  * here each refresh reads only the commit-range increment (file-
  * pruned by the commit log, same path as [[IncrementalReader]]),
  * partial-aggregates the batch, and upserts ONLY the touched groups.
  *
  * Exactly-once: the refresh upsert carries an idempotency key derived
  * from the increment's end commit, and the checkpoint is persisted
  * AFTER the state write — a crash in between replays the increment,
  * the key makes the re-apply a no-op, and the checkpoint then
  * advances. (This is the aggregate analog of the keyed-sink
  * at-least-once story in [[IncrementalReader]]'s scaladoc: row
  * upserts are naturally idempotent, aggregate MERGES are not — the
  * key is what restores exactly-once.)
  *
  * The key alone is not enough when NEW source commits land inside the
  * crash window: a retry that re-reads to the new head would fold
  * [checkpoint, newHead] under a DIFFERENT key and double-apply the
  * already-merged commits. So each refresh first durably records an
  * INTENT — the end commit it is about to fold — in the checkpoint
  * store under `{state}__intent`, BEFORE the state upsert. A retry
  * that finds an outstanding intent (> the source checkpoint) bounds
  * its read to that same end commit: identical range ⇒ identical key ⇒
  * the replay is a no-op, the checkpoint advances, and the newer
  * commits are picked up by the NEXT refresh as their own increment.
  * The intent is deleted once the checkpoint has advanced past it; a
  * stale intent (≤ checkpoint) is ignored.
  *
  * APPEND-ONLY is a real precondition, not a formality: count/sum/min/
  * max are only incrementally mergeable when increments never revise
  * rows. A source that upserts needs before-images (CDC) to retract —
  * compose [[TableOps.applyChanges]]' change feed with a retraction
  * merge instead of this operator.
  *
  * All four aggregates merge associatively: cnt adds, sum adds (the
  * merged sum is cast back to the batch-agg's own sum type so the
  * state schema stays FIXED across refreshes — decimal addition would
  * otherwise widen precision every refresh and break the upsert's
  * schema-stability), min/max take least/greatest with null-safe
  * coalesce for groups new to the state.
  */
object IncrementalAgg {

  /** State table layout for `groupCols`: record key = the group,
    * precombine = cnt (monotone under appends — a merged row always
    * supersedes its predecessor).
    */
  def stateTable(name: String, path: String,
      groupCols: Seq[String]): KeyedTable =
    KeyedTable(name, path, recordKey = groupCols, precombineKey = "cnt")

  private def intentKey(state: KeyedTable): String = s"${state.name}__intent"

  /** Read the increment to fold, honoring an outstanding intent record
    * (crash replay → same commit range), and durably record the intent
    * for a fresh increment BEFORE the caller's state upsert.
    */
  private def plannedIncrement(spark: SparkSession, source: KeyedTable,
      state: KeyedTable, store: CheckpointStore): Increment = {
    val begin = store.get(source.name).map(_.lastProcessedCommit).getOrElse("")
    val pending = store.get(intentKey(state))
      .map(_.lastProcessedCommit).filter(_ > begin)
    val inc = new IncrementalReader(store).read(spark, source, pending)
    if (pending.isEmpty) inc.advanceTo.foreach { cp =>
      store.put(Checkpoint(cp.lastProcessedCommit, intentKey(state),
        source.path, cp.insertedTime))
    }
    inc
  }

  /** Advance the checkpoint past the folded increment and retire its
    * intent record (crash before the delete leaves a stale intent ≤
    * checkpoint, which [[plannedIncrement]] ignores).
    */
  private def finish(store: CheckpointStore, state: KeyedTable,
      cp: Checkpoint): Unit = {
    store.put(cp)
    store.delete(intentKey(state))
  }

  /** Consume all commits since the checkpoint and fold them into the
    * state; returns the refreshed state snapshot (unchanged when the
    * increment is empty). One increment scan + one group-cardinality
    * state scan (AQE broadcasts the batch side); only touched groups
    * are rewritten.
    */
  def refresh(spark: SparkSession, source: KeyedTable, state: KeyedTable,
      store: CheckpointStore, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be nonempty")
    val inc = plannedIncrement(spark, source, state, store)
    inc.advanceTo match {
      case None => snapshot(spark, state, groupCols)
      case Some(cp) =>
        val batch = inc.df.groupBy(groupCols.map(col): _*).agg(
          count(lit(1)).as("cnt"),
          sum(col(valueCol)).as("sum_v"),
          min(col(valueCol)).as("min_v"),
          max(col(valueCol)).as("max_v"))
        val sumType = batch.schema("sum_v").dataType
        val merged =
          if (!TableOps.exists(spark, state)) batch
          else {
            val cur = TableOps.snapshot(spark, state)
              .select(groupCols.map(col) :+ col("cnt").as("_cur_cnt") :+
                col("sum_v").as("_cur_sum") :+ col("min_v").as("_cur_min") :+
                col("max_v").as("_cur_max"): _*)
            // right join: only groups touched by the batch survive —
            // untouched state rows are never rewritten
            cur.join(batch, groupCols, "right_outer")
              .select(groupCols.map(col) ++ Seq(
                (coalesce(col("_cur_cnt"), lit(0L)) + col("cnt")).as("cnt"),
                (coalesce(col("_cur_sum"), lit(0).cast(sumType)) +
                  col("sum_v")).cast(sumType).as("sum_v"),
                least(coalesce(col("_cur_min"), col("min_v")), col("min_v"))
                  .as("min_v"),
                greatest(coalesce(col("_cur_max"), col("max_v")), col("max_v"))
                  .as("max_v")): _*)
          }
        TableOps.upsert(spark, state, merged,
          idempotencyKey =
            Some(s"incagg:${source.name}:${cp.lastProcessedCommit}"))
        finish(store, state, cp)
        snapshot(spark, state, groupCols)
    }
  }

  /** Incrementally-maintained per-group DISTINCT count. Exact distinct
    * is NOT incrementally mergeable (yesterday's count plus today's
    * count double-counts returning keys) — the mergeable substitute is
    * the HLL sketch: the state keeps one DataSketches HLL binary per
    * group (`hll_sketch_agg`), each refresh unions the increment's
    * sketch in (`hll_union` — a register-wise max, order- and
    * layout-independent), and the estimate materializes on read
    * (`hll_sketch_estimate`, ~1.6% relative error at the default
    * lgConfigK=12). Same exactly-once refresh protocol as [[refresh]].
    * This is the at-scale shape for "distinct users per segment, daily
    * refreshed" over a 10¹²-row stream: state is group-cardinality ×
    * ~1 KB, refresh cost is O(increment).
    */
  def refreshDistinct(spark: SparkSession, source: KeyedTable,
      state: KeyedTable, store: CheckpointStore, groupCols: Seq[String],
      keyCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be nonempty")
    val inc = plannedIncrement(spark, source, state, store)
    inc.advanceTo match {
      case None => distinctSnapshot(spark, state, groupCols)
      case Some(cp) =>
        val batch = inc.df.groupBy(groupCols.map(col): _*).agg(
          count(lit(1)).as("cnt"),
          hll_sketch_agg(col(keyCol)).as("hll"))
        val merged =
          if (!TableOps.exists(spark, state)) batch
          else {
            val cur = TableOps.snapshot(spark, state)
              .select(groupCols.map(col) :+ col("cnt").as("_cur_cnt") :+
                col("hll").as("_cur_hll"): _*)
            cur.join(batch, groupCols, "right_outer")
              .select(groupCols.map(col) ++ Seq(
                (coalesce(col("_cur_cnt"), lit(0L)) + col("cnt")).as("cnt"),
                when(col("_cur_hll").isNull, col("hll"))
                  .otherwise(hll_union(col("_cur_hll"), col("hll")))
                  .as("hll")): _*)
          }
        TableOps.upsert(spark, state, merged,
          idempotencyKey =
            Some(s"incdst:${source.name}:${cp.lastProcessedCommit}"))
        finish(store, state, cp)
        distinctSnapshot(spark, state, groupCols)
    }
  }

  private def distinctSnapshot(spark: SparkSession, state: KeyedTable,
      groupCols: Seq[String]): DataFrame =
    if (TableOps.exists(spark, state))
      TableOps.snapshot(spark, state)
        .select(groupCols.map(col) ++ Seq(col("cnt"),
          hll_sketch_estimate(col("hll")).as("approx_distinct")): _*)
    else {
      import spark.implicits._
      Seq.empty[String].toDF(groupCols.head).filter(lit(false))
    }

  private def snapshot(spark: SparkSession, state: KeyedTable,
      groupCols: Seq[String]): DataFrame =
    if (TableOps.exists(spark, state))
      TableOps.snapshot(spark, state)
        .select(groupCols.map(col) ++
          Seq("cnt", "sum_v", "min_v", "max_v").map(col): _*)
    else {
      import spark.implicits._
      Seq.empty[String].toDF(groupCols.head) // empty; schema rarely read
        .filter(lit(false))
    }
}
