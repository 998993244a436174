package graft.streaming

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured-Streaming upgrade of the reference's batch-incremental
  * model (SURVEY.md §2i: the reference pulls commit ranges in batch; the
  * idiomatic Spark form is `readStream` + checkpointLocation, which
  * subsumes the hand-rolled JSON checkpoint with exactly-once source
  * tracking).
  *
  * `foreachBatch` bridges the stream into [[graft.ops.TableOps.upsert]]:
  * each micro-batch is key-merged into the target COW table, so the sink
  * keeps upsert semantics (idempotent under replay — the at-least-once
  * story of SURVEY.md §2i I3 carries over unchanged).
  */
object StreamingEtl {

  /** Stream a parquet directory (file-source) into a keyed table via
    * per-batch upsert. `schema` is required by streaming file sources.
    * Caller controls lifecycle via the returned query (tests use
    * `processAllAvailable()`).
    */
  def parquetToTable(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      target: KeyedTable,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId as idempotency key ⇒ exactly-once sink: a micro-batch
        // replayed after a crash-before-checkpoint is skipped by the
        // commit manifest (txn-manifest pattern).
        TableOps.upsert(spark, target, batch,
          idempotencyKey = Some(s"${target.name}-batch-$batchId")): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming MOR ingest — the workload Hudi's MERGE_ON_READ table
    * type exists for: each micro-batch lands as an O(batch)-byte delta
    * commit ([[graft.ops.TableOps.deltaCommit]]) instead of a COW
    * partition rewrite, and INLINE COMPACTION folds the deltas back to
    * base files once `compactEvery` accumulate (Hudi's
    * `hoodie.compact.inline.max.delta.commits` trigger). Between
    * compactions readers get the merged real-time view; batch-id
    * idempotency keys keep the sink exactly-once under replay, and a
    * replayed batch that skips also skips the compaction probe (the
    * delta count is unchanged).
    *
    * `maxFilesPerTrigger` bounds micro-batch size (admission control —
    * a backlogged source must not fold into one giant batch).
    */
  def parquetToTableMor(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      target: KeyedTable,
      checkpointDir: String,
      compactEvery: Int = 4,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n): Unit)
    reader.parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ts = TableOps.deltaCommit(spark, target, batch,
          idempotencyKey = Some(s"${target.name}-mor-$batchId"))
        if (ts.nonEmpty &&
            TableOps.liveDeltaCommits(spark, target).size >= compactEvery)
          TableOps.compactDeltas(spark, target): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Continuous silver→gold CDC: stream `source`'s change records
    * ([[IncrementalSource.changes]]) and key-merge each micro-batch
    * into `target` — the streaming form of the reference's polled
    * incremental ETL (incremental_etl_orders.py:236-283), with the
    * file-source checkpoint replacing the hand-rolled JSON checkpoint
    * and batch-id idempotency keys making the sink exactly-once.
    *
    * Change semantics: upserts and SOFT deletes (tombstone rows) flow;
    * a HARD delete in the source emits no change record (the reference
    * engine behaves the same way — Hudi emits delete markers only for
    * delete operations routed through its writer), so pipelines that
    * hard-delete upstream must either soft-delete or re-seed the
    * target. Same caveat family as [[IncrementalSource.changes]].
    */
  def tableToTable(
      spark: SparkSession,
      source: KeyedTable,
      target: KeyedTable,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity): StreamingQuery =
    IncrementalSource.changes(spark, source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TableOps.upsert(spark, target,
          transform(batch.drop(graft.tables.KeyedTable.CommitCol)),
          idempotencyKey = Some(s"${target.name}-cdc-$batchId")): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming CDC-APPLY sink: each micro-batch is an I/U/D change
    * batch routed through [[TableOps.applyChanges]] — the streaming
    * face of op-aware MERGE INTO (a debezium-topic consumer's shape),
    * covering the HARD-delete case [[tableToTable]]'s upsert sink
    * cannot express. Batch-id idempotency keys keep the upsert half
    * exactly-once under replay; the delete half is naturally
    * idempotent.
    */
  def changesToTable(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      target: KeyedTable,
      checkpointDir: String,
      opCol: String = "_op"): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TableOps.applyChanges(spark, target, batch, opCol,
          idempotencyKey = Some(s"${target.name}-cdcapply-$batchId")): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup with bounded state: first occurrence per key
    * wins; duplicates arriving within the watermark are dropped and the
    * per-key state expires with it (`dropDuplicatesWithinWatermark` —
    * the streaming face of the batch [[graft.ext.Dedup]] family; an
    * unbounded-state `dropDuplicates` would OOM on an infinite stream).
    */
  def dedupStream(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      keyCols: Seq[String],
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join — each left event matched to the
    * right-side events of the same key whose time lies within
    * `[leftTime − within, leftTime]` (the streaming face of the batch
    * [[graft.ops.AsOfJoin]] enrichment: a purchase joined to the views
    * that preceded it). Both sides carry watermarks and the join
    * condition bounds the event-time distance, so Spark buffers each
    * side only `within + watermark` of state and evicts rows whose
    * join window has conclusively passed — an unconstrained
    * stream-stream join would buffer both streams forever.
    */
  def intervalJoin(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      within: String,
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "interval join needs equi-join keys")
    val l = leftDf.withWatermark(leftTime, watermark).alias("l")
    val r = rightDf.withWatermark(rightTime, watermark).alias("r")
    val keyCond = keyCols.map(k => col(s"l.$k") === col(s"r.$k"))
      .reduce(_ && _)
    val rangeCond = col(s"r.$rightTime") <= col(s"l.$leftTime") &&
      col(s"r.$rightTime") >= col(s"l.$leftTime") - expr(s"INTERVAL $within")
    l.join(r, keyCond && rangeCond, "inner")
  }

  /** Streaming windowed aggregation with a watermark — the event-time
    * capability the reference lacks (SURVEY.md §2i: "no watermarks, no
    * event-time windows"). Tumbling count per (window, event_type);
    * late data beyond `watermark` is dropped, bounding state for an
    * unbounded stream.
    */
  def windowedCounts(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))
  }
}
