package graft.streaming

import graft.tables.KeyedTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming CDC-style incremental source over a keyed table — the
  * Structured-Streaming analog of Hudi's incremental streaming read
  * (`spark.readStream.format("hudi")`; the reference polls commit
  * ranges in batch instead, incremental_etl_orders.py:217-227).
  *
  * Backed by [[CommitStreamSource]] — a manifest-driven source whose
  * offsets are PUBLISHED COMMIT TIMESTAMPS, so:
  *
  *   - each published commit's change records (rows first written by
  *     that commit — carried-over COW rows keep their old `_commit_ts`
  *     and are filtered) are delivered exactly once, atomically with
  *     the commit's manifest;
  *   - a commit dir whose writer crashed before publishing — invisible
  *     to every batch reader — is equally invisible to the stream (no
  *     manifest ⇒ no offset ⇒ never read), and an in-flight commit
  *     cannot be half-consumed: it enters the stream whole or not at
  *     all;
  *   - a bootstrap run streams every retained commit (same contract as
  *     the batch reader's bootstrap); compaction commits emit nothing
  *     (correct — nothing changed logically); soft-delete tombstones
  *     arrive as ordinary change rows with `_deleted = true`.
  *
  * Restart within the cleaner's retention window — a commit cleaned
  * while the stream was down no longer has individual change records
  * (it was merged into newer dirs), same as any compacted CDC log.
  */
object IncrementalSource {

  /** Change-record stream of `t`. Options are [[CommitStreamProvider]]
    * options (e.g. `maxCommitsPerTrigger`). Pass `schema` to start the
    * stream on a table with no commits yet (the stream then idles until
    * the first manifest publishes); otherwise the manifest schema is
    * required at start.
    */
  def changes(spark: SparkSession, t: KeyedTable,
      options: Map[String, String] = Map.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val reader = options.foldLeft(
      spark.readStream.format(classOf[CommitStreamProvider].getName)
        .option("table.name", t.name)
        .option("table.path", t.path)
        .option("table.recordKey", t.recordKey.mkString(","))
        .option("table.precombine", t.precombineKey)
        .option("table.partitionBy", t.partitionBy.mkString(",")))(
      (r, kv) => r.option(kv._1, kv._2))
    schema.foldLeft(reader)((r, s) => r.schema(s)).load()
  }
}
