package graft.streaming

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming CDC-style incremental source over a keyed table — the
  * Structured-Streaming analog of Hudi's incremental streaming read
  * (`spark.readStream.format("hudi")`; the reference polls commit
  * ranges in batch instead, incremental_etl_orders.py:217-227).
  *
  * The manifest-pointer layout makes this a plain file stream: every
  * commit adds a fresh immutable dir `data/{commitTs}/…`, so Spark's
  * file source (which tracks processed FILES in its checkpoint)
  * delivers each commit's files exactly once, with no custom Source
  * implementation. Two corrections re-establish row-level change
  * semantics:
  *
  *   - A COW rewrite copies untouched rows of an affected partition
  *     into the new dir. Those carried-over rows keep their OLD
  *     `_commit_ts`, so filtering `file's commit dir == _commit_ts`
  *     keeps exactly the rows first written by that commit — the
  *     change records.
  *   - The commit dir breaks hive partition discovery (it sits between
  *     `data/` and `part=…`), so the schema passed to the source is
  *     data-columns-only and partition values are re-parsed from the
  *     file path (url-decoded, cast to their manifest-declared types).
  *
  * Consequences: a bootstrap run streams every live commit dir (same
  * contract as the batch reader's bootstrap); compaction commits emit
  * nothing (all their rows carry older `_commit_ts` — correct, nothing
  * changed logically); cleaned dirs are simply absent. Soft-delete
  * tombstones arrive as ordinary change rows with `_deleted = true`.
  *
  * Caveat (writer-crash window): the file source has no manifest
  * awareness, so a commit dir whose writer crashed BEFORE publishing
  * its manifest — invisible to every batch reader — can still feed
  * phantom change rows into a micro-batch that polls before recovery.
  * The single-writer recovery protocol is: run `TableOps.clean` (which
  * collects orphan commit dirs) before restarting the writer or the
  * stream after an unclean shutdown. An in-flight commit's files may
  * also split across consecutive micro-batches (file-level tracking
  * means no duplicates, and completeness once the commit publishes) —
  * downstream keyed upsert sinks are insensitive to both effects.
  */
object IncrementalSource {

  /** Change-record stream of `t`. Options (e.g. `maxFilesPerTrigger`)
    * apply to the underlying file source.
    */
  def changes(spark: SparkSession, t: KeyedTable,
      options: Map[String, String] = Map.empty): DataFrame = {
    val sch = TableOps.latestSchema(spark, t).getOrElse(
      throw new IllegalStateException(
        s"table ${t.name} has no commit manifest — nothing to stream"))
    val dataSchema = StructType(
      sch.filterNot(f => t.partitionBy.contains(f.name)))
    val raw = options.foldLeft(spark.readStream)((r, kv) =>
      r.option(kv._1, kv._2))
      .schema(dataSchema)
      // recursive lookup (a) sidesteps hive partition inference, which
      // the {commitTs} level would break, and (b) picks up new commit
      // dirs as they appear
      .option("recursiveFileLookup", "true")
      .parquet(t.dataPath)
      .withColumn("_file", input_file_name())
    val withParts = t.partitionBy.foldLeft(raw) { (df, p) =>
      val declared = sch(p).dataType
      df.withColumn(p,
        url_decode(regexp_extract(col("_file"),
          java.util.regex.Pattern.quote(s"/$p=") + "([^/]+)/", 1))
          .cast(declared))
    }
    withParts
      .filter(regexp_extract(col("_file"), "/data/([0-9]{17})/", 1) ===
        col(KeyedTable.CommitCol))
      .select(sch.fieldNames.toIndexedSeq.map(col): _*)
  }
}
