package graft.streaming

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}

/** Commit offset: the 17-digit instant string itself (lexicographically
  * == chronologically ordered, so string compare is range logic).
  */
private[streaming] case class CommitOffset(ts: String) extends Offset {
  override def json: String = ts
}

/** Manifest-driven streaming source over a [[KeyedTable]] — the engine's
  * `spark.readStream.format("hudi")` analog, built the way Delta builds
  * its streaming source: OFFSETS ARE PUBLISHED COMMITS, not files.
  *
  * `getOffset` lists the commit log (kilobyte manifests, driver-side);
  * `getBatch(start, end]` reads exactly the immutable `data/{ts}` dirs
  * of the commits in the range and keeps each dir's rows stamped with
  * its own `_commit_ts` — the change records (carried-over COW rows
  * keep their old stamp and are filtered; compaction commits therefore
  * emit nothing, which is correct: nothing changed logically).
  *
  * Why offsets-are-commits is the load-bearing design choice (vs the
  * file-stream + filter approach it replaces):
  *
  *   - An UNPUBLISHED commit dir — a crashed or in-flight writer's —
  *     is structurally invisible: it has no manifest, so no offset ever
  *     covers it. No phantom rows, ever.
  *   - No data loss either: a stateless "filter by published set" over
  *     a file stream CONSUMES an in-flight commit's early files (file
  *     sources track processed files) and then drops them — when the
  *     commit publishes a moment later those rows are gone for good.
  *     Here the commit becomes visible atomically with its manifest,
  *     whole or not at all.
  *   - Partition values parse through Spark's own `basePath` partition
  *     discovery per commit dir (manifest-declared types), not a path
  *     regex — immune to base paths that look like commit dirs and to
  *     escaped partition values.
  *
  * Retention contract: an incremental consumer must restart within the
  * cleaner's retention window ([[TableOps.clean]]) — a commit cleaned
  * while the stream was down has been merged into newer dirs and its
  * individual change records no longer exist (same contract as any
  * compacted CDC log); such commits are skipped with a warning. When
  * the cleaner ran with `archive = true` the lagging restart is
  * DETECTABLE (the archived timeline evidences the lost instants), and
  * the batch fails LOUD instead of silently emitting a feed with a
  * hole — re-seed from a snapshot, or pass the
  * `allowIncompleteFeed = true` source option to accept the surviving
  * records (the batch [[TableOps.changeLog]] guard, same rule).
  *
  * Rate limiting: `maxCommitsPerTrigger` caps how many commits one
  * micro-batch covers, exactly, including across restarts — the source
  * implements `SupportsAdmissionControl`, so the engine hands it the
  * previous end offset on every trigger. `Trigger.AvailableNow` drains
  * the backlog-at-start across as many rate-limited batches as needed
  * (`SupportsTriggerAvailableNow`, same contract as FileStreamSource).
  */
class CommitStreamSource(spark: SparkSession, t: KeyedTable,
    maxCommitsPerTrigger: Option[Int],
    userSchema: Option[StructType] = None,
    allowIncompleteFeed: Boolean = false)
    extends Source with SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming

  private val log = CommitLog(t, spark)
  // Trigger.AvailableNow contract: process everything published at
  // query START (across as many rate-limited micro-batches as needed),
  // ignoring commits that land during the run (same as
  // FileStreamSource's implementation of this interface). None = not
  // an AvailableNow run; Some("") = prepared on a then-empty table, in
  // which case the run must process NOTHING even if commits land later.
  @volatile private var availableNowCap: Option[String] = None

  /** A user-supplied schema lets the stream START on a table with no
    * commits yet (the start-stream-before-first-write bootstrap);
    * otherwise the manifest schema is required up front.
    */
  override val schema: StructType =
    userSchema.orElse(TableOps.latestSchema(spark, t)).getOrElse(
      throw new IllegalStateException(
        s"table ${t.name} has no commit manifest — nothing to stream " +
          "(pass an explicit schema to start before the first commit)"))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(log.listCommits().lastOption.getOrElse(""))

  override def getDefaultReadLimit: streaming.ReadLimit =
    maxCommitsPerTrigger
      .map(n => streaming.ReadLimit.maxRows(n.toLong))
      .getOrElse(streaming.ReadLimit.allAvailable())

  /** Admission-control offset discovery: the engine hands us the
    * PREVIOUS end offset, so the rate limiter is exact across restarts
    * (no internal baseline to lose). "Rows" in the limit are COMMITS —
    * the unit this source admits by.
    */
  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val startTs = Option(start).map(_.json).getOrElse("")
    val all = log.listCommits()
    val pending = availableNowCap.fold(all)(cap => all.filter(_ <= cap))
      .filter(_ > startTs)
    val admitted = limit match {
      case r: streaming.ReadMaxRows => pending.take(r.maxRows.toInt)
      case _ => pending
    }
    if (admitted.nonEmpty) CommitOffset(admitted.last)
    else if (startTs.nonEmpty) CommitOffset(startTs)
    else null
  }

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead " +
        "(SupportsAdmissionControl)")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startTs = start.map(_.json).getOrElse("")
    val endTs = end.json
    if (!allowIncompleteFeed) {
      // still-active instants (archival crash window) have lost
      // nothing — only archived instants with no active manifest are
      // evidence of a cleaned-away change set. The ranged call prunes
      // non-overlapping archive batches by filename before opening
      // any, so a steady-state trigger (fresh range past the archive)
      // pays one dir listing, not an O(#batches) parse — the guard
      // runs per micro-batch.
      val active = log.listCommits().toSet
      val lost = log.archivedMetas(
          range = Some((startTs, Some(endTs)))).filter { m =>
        m.get("commit_ts").exists(ts => !active(ts)) &&
          !m.get("action").exists(TableOps.CdcNonContributing)
      }
      if (lost.nonEmpty) throw new IllegalStateException(
        s"stream over ${t.name}: batch ($startTs, $endTs] is " +
          s"incomplete — ${lost.size} change-bearing commit(s) were " +
          "cleaned beyond retention while the stream was down " +
          s"(earliest lost: ${lost.head.getOrElse("commit_ts", "?")}). " +
          "Re-seed the consumer from a snapshot, or set the " +
          "allowIncompleteFeed=true source option to read only the " +
          "surviving records")
    }
    val fs = new Path(t.dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap-adopted vers are skipped outright (they emit zero
    // change rows by contract — scanning the adopted corpus per batch
    // just to filter it out would be a full-corpus tax on every feed
    // that starts at the beginning); the rename lineage maps
    // pre-rename commits to their physical names
    val roots = log.externalRoots()
    val rens = log.renames()
    val frames = log.listCommits()
      .filter(ts => ts > startTs && ts <= endTs)
      .flatMap { ts =>
        // adopted (bootstrap) vers contribute zero change rows by
        // contract — skip, don't scan the adopted corpus per batch
        val dir = new Path(TableOps.verDir(t, roots, ts))
        if (roots.contains(ts)) None
        else if (!fs.exists(dir)) {
          // cleaned while the stream was down — see retention contract
          System.err.println(s"graft: stream over ${t.name} skipping " +
            s"commit $ts (cleaned beyond retention)")
          None
        } else Some(
          TableOps.readCommitDir(spark, Some(schema), rens, ts,
              dir.toString)
            .filter(col(KeyedTable.CommitCol) === lit(ts)))
      }
    org.apache.spark.sql.graft.ColumnBridge.asStreaming(
      frames.reduceOption(_.unionByName(_))
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema))
        .select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format(classOf[CommitStreamProvider].getName)`
  * provider. Options: `table.name`, `table.path`, `table.recordKey`
  * (comma-separated), `table.precombine`, `table.partitionBy`
  * (comma-separated, optional), `maxCommitsPerTrigger` (optional).
  * [[IncrementalSource.changes]] wires these from a [[KeyedTable]].
  */
class CommitStreamProvider extends StreamSourceProvider {

  private def tableOf(params: Map[String, String]): KeyedTable = {
    def req(k: String) = params.getOrElse(k, throw new
        IllegalArgumentException(s"graft commit stream: missing option $k"))
    def list(s: String) =
      s.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    KeyedTable(req("table.name"), req("table.path"),
      list(req("table.recordKey")), req("table.precombine"),
      params.get("table.partitionBy").map(list).getOrElse(Nil))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = tableOf(parameters)
    val sch = schema.orElse(
      TableOps.latestSchema(sqlContext.sparkSession, t)).getOrElse(
      throw new IllegalStateException(
        s"table ${t.name} has no commit manifest — nothing to stream"))
    (s"graft-commits[${t.name}]", sch)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new CommitStreamSource(sqlContext.sparkSession, tableOf(parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toInt),
      userSchema = schema,
      allowIncompleteFeed = parameters.get("allowIncompleteFeed")
        .exists(_.toBoolean))
}
