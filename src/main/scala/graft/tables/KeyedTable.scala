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
  * [[graft.ops.Upsert]]).
  */
final case class KeyedTable(
    name: String,
    path: String,
    recordKey: Seq[String],
    precombineKey: String,
    partitionBy: Seq[String] = Nil) {
  require(recordKey.nonEmpty, "recordKey must be nonempty")
  def dataPath: String = s"$path/data"
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
