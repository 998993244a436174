package graft.tables

/** Descriptor for a keyed, partitioned, versioned table — the engine's
  * fundamental abstraction (SURVEY.md §1). Replaces the reference's
  * `hoodie.*` option bag (reference: AirflowHudiLabs/Lab2/jobs/python/
  * create_hudi_tables.py:121-127,151-155):
  *
  *   - `recordKey`     ↔ hoodie.datasource.write.recordkey.field
  *   - `precombineKey` ↔ hoodie.datasource.write.precombine.field
  *   - `partitionBy`   ↔ hoodie.datasource.write.partitionpath.field
  *                       (+ hive-style partitioning, always on here)
  *
  * `path` is the table root; data lives under `path/data` (hive-style
  * partition dirs when `partitionBy` nonempty) and the commit log under
  * `path/.commits` (see [[CommitLog]]).
  *
  * Scale note: hive-style partition dirs keep partition pruning
  * directory-level at 100 TB; the record key is the unit of upsert
  * matching and must be unique in the latest snapshot (enforced by
  * [[graft.ops.Upsert]]) — per partition by default, globally when
  * `globalIndex` is set.
  *
  * `globalIndex` ↔ hoodie.index.type GLOBAL_BLOOM vs BLOOM
  * (create_hudi_tables.py:116): with the default `false`, upsert key
  * matching is PARTITION-SCOPED — an incoming key is merged only
  * against its own partition, and a key written under a new partition
  * value coexists with its old row (Hudi's default BLOOM behavior;
  * upsert cost is proportional to the increment's partition footprint).
  * With `true`, a key is unique table-wide and an upsert moves it
  * between partitions, with old-home discovery served by the persisted
  * bucketed [[KeyIndex]] under `.commits/index/` — never by scanning
  * the table.
  *
  * `statsColumns` ↔ hoodie.metadata.index.column.stats
  * (create_hudi_tables.py:176-183): columns whose per-FILE min/max/
  * null-count are recorded in a `_stats` sidecar at every write,
  * powering file-skipping reads via
  * [[graft.ops.TableOps.snapshotWhere]] (see [[ColumnStats]]). Declare
  * the columns selective predicates hit — ideally the ones writes
  * cluster by (`sortBy`), so per-file ranges are disjoint.
  */
final case class KeyedTable(
    name: String,
    path: String,
    recordKey: Seq[String],
    precombineKey: String,
    partitionBy: Seq[String] = Nil,
    globalIndex: Boolean = false,
    statsColumns: Seq[String] = Nil) {
  require(recordKey.nonEmpty, "recordKey must be nonempty")
  // fail at CONSTRUCTION, not after a full commit write aborts
  // pre-manifest inside ColumnStats.write
  require(statsColumns.forall(c => c.nonEmpty && !c.contains(".")),
    s"statsColumns must be top-level column names: $statsColumns")
  def dataPath: String = s"$path/data"

  /** The columns that identify a ROW of this table — the load-bearing
    * DML invariant: on a GLOBAL-indexed table the record key alone
    * (unique table-wide); on a partition-scoped table (key, partition)
    * — the same key may legitimately live in several partitions, so
    * batch dedup, delete scoping, and CDC op routing must all use THIS
    * list, never the bare record key.
    */
  def rowIdentity: Seq[String] =
    if (globalIndex) recordKey else (recordKey ++ partitionBy).distinct
  def commitsPath: String = s"$path/.commits"
}

object KeyedTable {
  /** System column stamped on every row at write time — the engine's
    * `_hoodie_commit_time` analog (reference reads it directly for
    * checkpointing: incremental_etl_orders.py:209-211,230-232).
    * Format: yyyyMMddHHmmssSSS (lexicographically == chronologically
    * ordered), so a plain string-compare pushdown filter implements
    * commit-range scans.
    */
  val CommitCol = "_commit_ts"
}
