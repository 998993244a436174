package graft.ops

import graft.tables.{KeyedTable, KeyedTable => KT}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MERGE_ON_READ table state — the engine's analog of Hudi's second
  * table type (the reference always configures COPY_ON_WRITE,
  * create_hudi_tables.py:119, but MOR is the other half of the same
  * Hudi surface: fast log-style writes, merge deferred to read or to
  * a scheduled compaction).
  *
  * Layout reuses the COW commit protocol unchanged: a delta commit is
  * an ordinary immutable `data/{ts}` dir holding ONLY the (deduped,
  * `_commit_ts`-stamped) incoming batch — no base rewrite. The commit
  * manifest republishes the UNCHANGED base partition→version map and
  * appends `ts` to a `deltas` list ([[TableOps.DeltasKey]]). Readers of
  * a manifest with live deltas merge base + deltas on the fly — Hudi's
  * real-time (`_rt`) view; [[TableOps.compactDeltas]] folds the deltas
  * into a fresh COW commit (Hudi's compaction), returning the table to
  * pure-COW state where every read is again a plain pruned scan.
  *
  * Write amplification is the point: a COW upsert rewrites every
  * affected partition per batch — at 100 TB with frequent small keyed
  * batches that is the dominant cost. A delta commit writes O(batch)
  * bytes; the merge cost is paid once per compaction instead of once
  * per batch, and reads between compactions pay a bounded
  * (#live-delta) merge — exactly the Hudi MOR trade.
  */
object Mor {

  /** Union of the live delta commits' rows, newest schema enforced.
    * Each `data/{ts}` delta dir is hive-partitioned exactly like a base
    * commit dir; `basePath` restores the partition columns, and the
    * manifest schema upcasts older (narrower) delta files the same way
    * base reads do.
    */
  def readDeltas(spark: SparkSession, t: KeyedTable, deltas: Seq[String],
      sch: Option[StructType]): DataFrame = {
    require(deltas.nonEmpty, s"table ${t.name}: no live delta commits")
    // pre-rename delta files store renamed columns under their OLD
    // physical names, exactly like base files — same mapping as
    // TableOps.readParts
    val rens = graft.tables.CommitLog(t, spark).renames()
    deltas.map { ts =>
      val dir = s"${t.dataPath}/$ts"
      TableOps.readCommitDir(spark, sch, rens, ts, dir)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Real-time view: base ∪ deltas resolved to the latest version per
    * ROW IDENTITY ([[KeyedTable.rowIdentity]] — (key, partition) on
    * partition-scoped tables, bare key table-wide on GLOBAL ones; the
    * same identity every COW write merges under) — precombine greatest
    * wins, then `_commit_ts`, then the delta side (identical tie-break
    * order to a COW upsert, so folding deltas via
    * [[TableOps.compactDeltas]] is a no-op on the visible rows).
    * Map-side partial `max_by` aggregation keeps the shuffle
    * O(distinct identities), not O(rows) — see [[Upsert.merge]].
    */
  def mergedView(base: DataFrame, deltaRows: DataFrame,
      t: KeyedTable): DataFrame =
    Upsert.merge(base, deltaRows, t.rowIdentity,
      Seq(t.precombineKey, KT.CommitCol))
}
