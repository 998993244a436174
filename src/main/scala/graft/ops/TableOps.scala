package graft.ops

import graft.tables.{ColumnStats, CommitLog, KeyIndex, KeyedTable, SecondaryIndex}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}

/** Physical table lifecycle for a [[graft.tables.KeyedTable]]: COW upsert
  * writes, snapshot reads, incremental reads, clustering, cleaning.
  *
  * Storage layout (SURVEY.md §1): immutable per-commit parquet dirs under
  * `{path}/data/{commitTs}` (hive-style partition dirs inside when
  * partitioned), every row stamped with `_commit_ts`. Each commit
  * manifest (`.commits/{ts}.commit`) carries the FULL partition→version
  * map (`parts`): which commit dir currently owns each partition.
  * Readers resolve the newest manifest and read exactly the referenced
  * dirs — a manifest-pointer commit protocol (Delta/Iceberg-style):
  *
  *   - Writers only ADD files (a new `data/{ts}` dir) and then publish
  *     one small manifest. No data file or dir is ever renamed or
  *     mutated, so the protocol is safe on object stores where dir
  *     rename is non-atomic copy+delete (the reference deploys on
  *     exactly such storage: s3a://MinIO,
  *     incremental_etl_orders.py:56-63).
  *   - The manifest itself appears atomically everywhere: single-file
  *     temp+rename on POSIX/HDFS (rename-atomic), single-object PUT
  *     a.k.a. copy-then-delete on S3 (the destination never exists in
  *     partial form). A reader that races a crashed writer sees either
  *     the old manifest or the new one — never a half-commit; an
  *     unfinished `data/{ts}` dir is invisible because nothing
  *     references it, and a truncated manifest is skipped (see
  *     [[graft.tables.CommitLog.commitMeta]]).
  *   - No `_latest` pointer file: commit listing (strongly consistent
  *     on S3 since 2020 and on every FS) already yields the newest
  *     manifest, and a pointer could only lag it.
  *
  * The Hudi features the reference turns on map to:
  *
  *   - gzip parquet + file sizing (create_hudi_tables.py:131,171-174)
  *     → `parquet.compression` + `maxRecordsPerFile` write options
  *   - BLOOM record index (create_hudi_tables.py:116,166-168)
  *     → parquet bloom filters on the record key columns
  *   - clustering sort (create_hudi_tables.py:157-163)
  *     → `repartitionByRange().sortWithinPartitions()` before write
  *   - cleaner (create_hudi_tables.py:141-148) → [[clean]] (drops
  *     data dirs no retained manifest references)
  *
  * Concurrency: single-writer per table by default (the reference only
  * enables OCC for metadata indexing; SURVEY.md §2k); readers are
  * always safe. Multi-writer deployments serialize writes with
  * [[graft.tables.TableLock.withLock]] (the reference's OCC lock
  * provider analog); the `expectedPrev` tripwire in
  * [[graft.tables.CommitLog.logCommit]] stays as the last-line
  * lost-update detector either way.
  */
object TableOps {

  /** Write options applied to every parquet write. Bloom filters on the
    * record key make the next upsert's key-matching join cheap to probe
    * (Hudi BLOOM index analog).
    */
  private[ops] def writer(df: DataFrame, t: KeyedTable, sortBy: Seq[String],
      maxRecordsPerFile: Long) = {
    val clustered =
      if (sortBy.nonEmpty)
        df.repartitionByRange(sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df
    var w = clustered.write
      .mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    t.recordKey.foreach { k =>
      w = w.option(s"parquet.bloom.filter.enabled#$k", "true")
    }
    if (t.partitionBy.nonEmpty) w = w.partitionBy(t.partitionBy: _*)
    w
  }

  /** A table exists once it has a published commit (an orphan data dir
    * from a crashed first write references nothing and counts as
    * nonexistent).
    */
  def exists(spark: SparkSession, t: KeyedTable): Boolean =
    currentParts(spark, t, None).isDefined

  /** Lock-by-default beside a live [[TableService]] (VERDICT r14 #2):
    * when the table carries an unexpired service presence marker,
    * every write entry point wraps its whole compute-and-publish
    * window in the table lock AUTOMATICALLY — the async cleaner
    * deletes commit-shaped dirs no retained manifest references, and
    * a mid-commit writer's staged dir is exactly that until its
    * manifest publishes, so an unserialized write beside the service
    * risks losing an in-flight commit. The safe shape is now the
    * default, not a documented convention.
    *
    * Re-entrancy is thread-scoped ([[TableLock.heldByCurrentThread]]):
    * the service's own housekeeping (already under the lock) and a
    * writer inside an explicit `withLock` run the body directly; a
    * DIFFERENT thread waits, which is precisely the serialization the
    * lock exists for. Cost when no service runs: one metadata-sized
    * `exists` probe per write — noise against a commit. A crashed
    * service's stale marker ages out with its lease, and until then
    * writers merely acquire a FREE lock (no wait), so the failure
    * mode is benign.
    */
  private def serviceGuard[A](spark: SparkSession, t: KeyedTable)(
      body: => A): A =
    // cheap map lookup FIRST: every nested guarded call under a held
    // lock (compactDeltas inside upsert, the service pass's own
    // housekeeping) short-circuits without touching the filesystem
    if (!graft.tables.TableLock.heldByCurrentThread(t) &&
        TableService.activeMarker(spark, t).isDefined)
      graft.tables.TableLock.withLock(spark, t)(body)
    else body

  /** Partition-pruning predicate selecting exactly the given partition
    * tuples. O(1) expression depth regardless of tuple count: a single
    * `IN` node (single-column) or one struct-`IN` (multi-column) — a
    * 10k-partition backfill must not build a 10k-node boolean tree
    * (analyzer/codegen blowup; VERDICT r1 #4).
    */
  private def partitionPredicate(partCols: Seq[String], schema: StructType,
      affected: Array[Row]): Column =
    if (affected.isEmpty) lit(false)
    else if (partCols.lengthCompare(1) == 0) {
      val (nulls, vals) = affected.map(_.get(0)).partition(_ == null)
      val c = col(partCols.head)
      val in = if (vals.nonEmpty) c.isin(vals.toSeq: _*) else lit(false)
      if (nulls.nonEmpty) in || c.isNull else in
    } else {
      import org.apache.spark.sql.catalyst.expressions.{Expression, In, Literal}
      import org.apache.spark.sql.graft.ColumnBridge
      // `IN` is null-hostile (a tuple containing NULL never matches —
      // three-valued logic), so null-free tuples go through the single
      // struct-IN node and the (rare — at most one hive default
      // partition per column) null-carrying tuples get an OR'd
      // null-safe conjunction each.
      val (withNulls, noNulls) = affected.partition(r =>
        partCols.indices.exists(r.isNullAt))
      val inPred =
        if (noNulls.isEmpty) lit(false)
        else {
          val probe = ColumnBridge.expression(struct(partCols.map(col): _*))
          val lits = noNulls.toSeq
            .map(r => Literal.create(r, schema): Expression)
          ColumnBridge.column(In(probe, lits))
        }
      withNulls.map(r =>
        partCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }
          .reduce(_ && _))
        .foldLeft(inPred)(_ || _)
    }

  // ————————————————————————————— manifest parts map (rel → commit dir)

  /** Key under which the partition→version map rides in the manifest;
    * rel "" denotes the whole (unpartitioned) table.
    */
  private[ops] val PartsKey = "parts"

  /** Key under which a MERGE_ON_READ table's live delta-commit list
    * rides in the manifest (JSON array of commit ts; absent/empty for
    * pure-COW state). See [[Mor]].
    */
  private[ops] val DeltasKey = "deltas"

  /** Actions that never contribute change records to a CDC feed —
    * restore republishes metadata only, delete_partition removals emit
    * nothing by contract, schema_rename/schema_drop are metadata-only
    * column surgery, a compaction's dir carries rows stamped with
    * their ORIGINAL commit ts (a pure fold contributes nothing under
    * the `_commit_ts === ts` filter), a hard `delete` rewrites the
    * SURVIVORS with their old stamps (its removals are CDC-invisible
    * even while live — the documented contract; tombstone visibility
    * is the soft-delete path, which commits as an upsert), and a
    * `bootstrap`'s adopted rows carry NULL stamps (consumers begin
    * FROM the bootstrap instant). Every other action (upsert/
    * deltacommit/insert/replacecommit, or an unknown future action) is
    * treated as change-bearing — the completeness guards fail
    * conservatively loud. Shared by the batch [[changeLog]] and the
    * streaming [[graft.streaming.CommitStreamSource]]: an archived
    * commit of THESE actions loses nothing a live one would have
    * delivered, so tripping the guard on it would be a spurious
    * failure, not protection.
    */
  val CdcNonContributing: Set[String] =
    Set("restore", "delete_partition", "compact",
      "schema_rename", "schema_drop", "delete", "bootstrap")

  private[ops] def deltasJson(deltas: Seq[String]): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(deltas))
  }

  private[ops] def deltasOf(meta: Map[String, String]): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    meta.get(DeltasKey).toSeq.flatMap { raw =>
      try JsonMethods.parse(raw) match {
        case JArray(items) => items.collect { case JString(v) => v }
        case _ => Nil
      } catch { case _: Exception => Nil }
    }
  }

  private[ops] def partsJson(parts: Map[String, String]): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(parts))
  }

  private[ops] def partsOf(meta: Map[String, String])
      : Option[Map[String, String]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    meta.get(PartsKey).flatMap { raw =>
      try JsonMethods.parse(raw) match {
        case JObject(fields) =>
          Some(fields.collect { case (k, JString(v)) => k -> v }.toMap)
        case _ => None
      } catch { case _: Exception => None }
    }
  }

  /** The partition→version map as of `asOf` (latest when None): newest
    * manifest at or before `asOf` that parses and carries a map.
    */
  private[ops] def currentParts(spark: SparkSession, t: KeyedTable,
      asOf: Option[String]): Option[Map[String, String]] =
    currentState(spark, t, asOf).map(_._1)

  /** The full table state a manifest describes — base partition→version
    * map plus the live MOR delta-commit list (empty for pure-COW state).
    * Newest manifest at or before `asOf` that parses and carries a
    * parts map.
    */
  private[ops] def currentState(spark: SparkSession, t: KeyedTable,
      asOf: Option[String]): Option[(Map[String, String], Seq[String])] = {
    val log = CommitLog(t, spark)
    val commits = log.listCommits()
    val candidates = asOf.fold(commits)(s => commits.filter(_ <= s))
    candidates.reverseIterator
      .flatMap(ts => log.commitMeta(ts))
      .flatMap(meta => partsOf(meta).map(_ -> deltasOf(meta)))
      .nextOption()
  }

  /** Delta commits live in the CURRENT manifest (empty = pure-COW
    * state). COW-mutating entry points fold these first (see
    * [[compactDeltas]]).
    */
  private def liveDeltas(spark: SparkSession, t: KeyedTable): Seq[String] =
    currentState(spark, t, None).map(_._2).getOrElse(Nil)

  /** The live (un-compacted) MOR delta commits, oldest first — empty in
    * pure-COW state. Drives compaction scheduling (Hudi's
    * `compact.inline.max.delta.commits` trigger shape) and test
    * introspection; kilobyte manifest read, never a data scan.
    */
  def liveDeltaCommits(spark: SparkSession, t: KeyedTable): Seq[String] =
    liveDeltas(spark, t)

  /** Newest commit whose manifest describes pure-COW state (no live
    * deltas) — the BASE state the [[graft.tables.KeyIndex]] keeps
    * tracking while delta commits stack on top of it.
    */
  private def lastBaseCommit(spark: SparkSession,
      t: KeyedTable): Option[String] = {
    val log = CommitLog(t, spark)
    log.listCommits().reverseIterator
      .flatMap(ts => log.commitMeta(ts).map(ts -> _))
      .collectFirst { case (ts, meta)
          if partsOf(meta).isDefined && deltasOf(meta).isEmpty => ts }
  }

  /** ver → adopted absolute root for this table (empty for every
    * non-bootstrapped table; see [[graft.tables.CommitLog.externalRoots]]).
    * Every code path that turns a parts-map ver into a physical dir
    * resolves through [[verDir]] with these — a metadata-only
    * bootstrap's files live at the adopted source root IN PLACE, never
    * under `data/{ver}`.
    */
  private[graft] def externalRoots(spark: SparkSession,
      t: KeyedTable): Map[String, String] =
    CommitLog(t, spark).externalRoots()

  /** Physical data dir of commit `ver` given preloaded adopted roots:
    * normally `data/{ver}`, the in-place source dir for a
    * bootstrap-adopted ver.
    */
  private[graft] def verDir(t: KeyedTable, roots: Map[String, String],
      ver: String): String =
    roots.getOrElse(ver, s"${t.dataPath}/$ver")

  /** Physical-name view of read schema `sch` for files of commit
    * `ver` under the table's column-rename lineage (the Delta
    * column-mapping analog; see [[graft.tables.CommitLog.renames]]):
    * walk the renames NEWER than `ver` newest-first, substituting each
    * NEW name back to its OLD — a file written before a rename stores
    * the column under the old physical name. Entries that postdate the
    * read schema itself (a time-travel read from before a later
    * rename) carry names the schema lacks and no-op, which makes the
    * same walk correct for any as-of schema without knowing the as-of
    * instant. Returns None when no substitution applies (every
    * non-renamed table — the common case pays nothing beyond the
    * lineage probe); otherwise the physical read schema plus the
    * (physical → logical) restore projection.
    */
  /** (continued) The walk is SYMMETRIC: renames NEWER than the ver map
    * backward (new→old — the read schema postdates the file), renames
    * AT OR BEFORE the ver map forward (old→new — the read schema
    * PREDATES the file, e.g. a running stream whose schema was
    * captured before a mid-stream rename reading commits written
    * after it). Each pass's substitutions are presence-conditional,
    * so entries on the wrong side of the schema's own era no-op and
    * the two passes touch disjoint lineage entries per field.
    */
  private def physicalFor(renames: Seq[(String, String, String)],
      ver: String, sch: StructType)
      : Option[(StructType, Seq[(String, String)])] = {
    if (renames.isEmpty) return None
    var names = sch.fields.map(_.name)
    // forward: schema-era older than the file — roll old names up to
    // the ver's era (ascending)
    renames.filter(_._1 <= ver).foreach { case (_, o, n) =>
      names = names.map(x => if (x == o) n else x)
    }
    // backward: schema-era newer than the file — roll new names back
    // (newest-first)
    renames.filter(_._1 > ver).reverse.foreach { case (_, o, n) =>
      names = names.map(x => if (x == n) o else x)
    }
    val logical = sch.fields.map(_.name)
    if (logical.sameElements(names)) None
    else Some((
      StructType(sch.fields.zip(names).map { case (f, pn) => f.copy(name = pn) }),
      names.zip(logical).toSeq))
  }

  /** One commit-dir read under rename mapping: scan with the PHYSICAL
    * schema of that ver, then project back to logical names. Shared
    * with [[graft.tables.ColumnStats]]'s pruned readers — every path
    * that scans a ver's files with an explicit schema must map, or a
    * renamed column silently reads NULL from pre-rename files.
    */
  private[graft] def readVer(spark: SparkSession, sch: Option[StructType],
      renames: Seq[(String, String, String)], ver: String,
      basePath: String, paths: Seq[String]): DataFrame =
    sch.flatMap(s => physicalFor(renames, ver, s)) match {
      case Some((phys, restore)) =>
        spark.read.schema(phys).option("basePath", basePath)
          .parquet(paths: _*)
          .select(restore.map { case (p, l) => col(p).as(l) }: _*)
      case None =>
        sch.foldLeft(spark.read)((r, s) => r.schema(s))
          .option("basePath", basePath)
          .parquet(paths: _*)
    }

  /** Single commit-dir read under the rename lineage — the shared
    * primitive for MOR delta reads and per-commit CDC reads.
    */
  private[graft] def readCommitDir(spark: SparkSession,
      sch: Option[StructType], renames: Seq[(String, String, String)],
      ver: String, dir: String): DataFrame =
    readVer(spark, sch, renames, ver, dir, Seq(dir))

  /** Read the table state a parts map describes. Reads are grouped per
    * owning commit dir so partition-column parsing gets a consistent
    * basePath; with a manifest schema the partition columns keep their
    * declared types (no dir-name inference), and the rename lineage
    * maps each group to its physical column names.
    */
  private[graft] def readParts(spark: SparkSession, t: KeyedTable,
      parts: Map[String, String], sch: Option[StructType]): DataFrame =
    if (parts.isEmpty) {
      val s = sch.getOrElse(throw new IllegalStateException(
        s"table ${t.name}: empty parts map and no manifest schema"))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    } else if (t.partitionBy.isEmpty) {
      val ver = parts("")
      val base = verDir(t, externalRoots(spark, t), ver)
      readVer(spark, sch, CommitLog(t, spark).renames(), ver,
        base, Seq(base))
    } else {
      val roots = externalRoots(spark, t)
      val rens = CommitLog(t, spark).renames()
      parts.groupBy(_._2).map { case (ver, m) =>
        val base = verDir(t, roots, ver)
        readVer(spark, sch, rens, ver, base,
          m.keys.toSeq.sorted.map(rel => s"$base/$rel"))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    }

  /** Current absolute dir per partition rel (rel "" when unpartitioned)
    * — ops/test introspection, metadata-sized.
    */
  def partitionDirs(spark: SparkSession, t: KeyedTable): Map[String, String] = {
    val roots = externalRoots(spark, t)
    currentParts(spark, t, None).getOrElse(Map.empty)
      .map { case (rel, ver) =>
        val base = verDir(t, roots, ver)
        rel -> (if (rel.isEmpty) base else s"$base/$rel")
      }
  }

  /** Partition rels present under a freshly-written commit dir (Seq("")
    * for unpartitioned). listStatus returns scheme-qualified paths;
    * qualify the prefix the same way or relativization silently fails.
    */
  private[ops] def relsOf(fs: FileSystem, dir: Path, depth: Int): Seq[String] =
    if (depth == 0) Seq("")
    else {
      def walk(p: Path, level: Int): Seq[Path] =
        if (level == 0) Seq(p)
        else if (!fs.exists(p)) Nil
        else fs.listStatus(p).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
          .flatMap(st => walk(st.getPath, level - 1))
      val dirQ = fs.makeQualified(dir)
      walk(dirQ, depth).map { leaf =>
        val rel = leaf.toString.stripPrefix(dirQ.toString).stripPrefix("/")
        require(rel.nonEmpty && !rel.contains(":"),
          s"failed to relativize staged partition dir $leaf against $dirQ")
        rel
      }
    }

  /** ver → rel of the data files backing `rows`, via `input_file_name`
    * — authoritative (re-formatting collected partition VALUES can
    * change their string identity: month='01' read back as int 1 would
    * reconstruct a nonexistent `month=1` dir). Metadata-sized collect
    * (one row per affected partition dir).
    */
  /** `fileCol`: a column already carrying `input_file_name()` values,
    * for frames whose plan joins a SECOND file source (Spark rejects
    * `input_file_name()` over multi-source plans) — the caller attaches
    * the column on the single-source side BEFORE the join.
    */
  private def backingRels(spark: SparkSession, t: KeyedTable,
      fs: FileSystem, rows: DataFrame,
      fileCol: Option[String] = None): Map[String, String] = {
    val dataQ = fs.makeQualified(new Path(t.dataPath))
    // bootstrap-adopted vers live OUTSIDE dataPath — relativize those
    // against their recorded root instead (qualified the same way)
    val extRoots = externalRoots(spark, t).map { case (ver, root) =>
      fs.makeQualified(new Path(root)).toString -> ver
    }
    fileCol.map(c => rows.select(col(c).as("f")))
      .getOrElse(rows.select(input_file_name().as("f"))).distinct().collect()
      .map(r => new Path(new java.net.URI(r.getString(0))).getParent)
      .map { p =>
        val q = fs.makeQualified(p).toString
        extRoots.collectFirst {
          case (rootStr, ver) if q == rootStr ||
              q.startsWith(rootStr + "/") =>
            q.stripPrefix(rootStr).stripPrefix("/") -> ver
        }.getOrElse {
          val verRel = q.stripPrefix(dataQ.toString).stripPrefix("/")
          require(verRel.nonEmpty && !verRel.contains(":"),
            s"failed to relativize affected partition dir $p against $dataQ")
          val (ver, rel) = verRel.span(_ != '/')
          rel.stripPrefix("/") -> ver
        }
      }.toMap
  }

  /** Upsert `incoming` into table `t` — the engine's
    * `df.write.format("hudi").mode("append")` analog
    * (create_hudi_tables.py:218-221). Returns the commit timestamp.
    *
    * Partitioned tables get a *partition-scoped* COW rewrite: only
    * affected partitions are merged and rewritten (into the new commit
    * dir); untouched partitions stay owned by their current dirs and
    * are not read. By default (Hudi BLOOM semantics) the affected set
    * is exactly the increment's own partitions and keys match within
    * their partition. With `t.globalIndex` (GLOBAL_BLOOM semantics,
    * create_hudi_tables.py:116) a key is matched table-wide and its old
    * partition joins the affected set — discovered via the persisted
    * [[KeyIndex]], not a table scan. Either way, at 100 TB with daily
    * increments the rewrite cost is proportional to the increment's
    * partition footprint, not the table.
    */
  def upsert(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      idempotencyKey: Option[String] = None,
      partial: Boolean = false): String =
    serviceGuard(spark, t)(upsertUnlocked(spark, t, incoming, sortBy,
      maxRecordsPerFile, idempotencyKey, partial))

  private def upsertUnlocked(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      sortBy: Seq[String],
      maxRecordsPerFile: Long,
      idempotencyKey: Option[String],
      partial: Boolean): String = {
    // Payload selection (Hudi hoodie.datasource.write.payload.class
    // analog): default = whole-row overwrite-with-latest (the payload
    // the reference config implies); partial = per-column latest-non-
    // null (PartialUpdateAvroPayload) — sparse update batches merge
    // into stored rows instead of erasing unmentioned columns. Same
    // commit protocol either way; only the merge/combine fns differ.
    val mergeFn: (DataFrame, DataFrame, Seq[String], Seq[String]) => DataFrame =
      if (partial) Upsert.mergePartial else Upsert.merge
    val combineFn: (DataFrame, Seq[String], Seq[String]) => DataFrame =
      if (partial) Upsert.dedupBatchPartial else Upsert.dedupBatch
    val log = CommitLog(t, spark)
    // Exactly-once upgrade of the at-least-once contract (SURVEY.md
    // §2i I3): a caller-supplied idempotency key (e.g. the streaming
    // micro-batch id) is recorded in the commit manifest; a replayed
    // batch whose key already committed is skipped ENTIRELY — before
    // any other work, including the MOR fold below (a replay storm
    // must not burn a compaction per replay).
    idempotencyKey.foreach { key =>
      if (log.hasIdempotencyKey(key)) return ""
    }
    // Emptiness guard — reference used count()>0 (a full scan,
    // create_hudi_tables.py:213); isEmpty touches one partition.
    if (incoming.isEmpty) return ""
    // Live MOR deltas fold into a COW commit FIRST: the partition-scoped
    // rewrite below discovers affected files via input_file_name(), which
    // yields nothing through the merged real-time view's aggregation —
    // and the parts-map ownership update assumes base dirs are the whole
    // table. Pure-COW tables skip this entirely.
    if (liveDeltas(spark, t).nonEmpty) compactDeltas(spark, t)
    // Lost-update tripwire: the commit below is computed on top of THIS
    // timeline head (see CommitLog.logCommit expectedPrev).
    val baseCommit = log.latestCommit()
    val ts = CommitLog.newCommitTs()
    // batch dedup under the same identity the MERGE uses — deduping a
    // partition-scoped batch by bare key would silently collapse a
    // batch that legitimately carries one row per partition per key
    val deduped = combineFn(incoming, t.rowIdentity,
      Seq(t.precombineKey))
    val stamped = deduped.withColumn(KeyedTable.CommitCol, lit(ts))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val dest = new Path(s"${t.dataPath}/$ts")
    val oldParts = currentParts(spark, t, None)
    // The authoritative table schema rides in the commit manifest
    // (Delta/Hudi-style): reads never depend on which file's footer
    // gets sampled, evolved columns are visible from every partition,
    // and an all-rows-deleted table stays readable. Partition columns
    // stay IN the schema. The recorded schema is the MERGE PLAN's
    // output schema: union coercion has already reconciled same-name
    // columns of different types (an int batch against a long table
    // widens — Hudi-style type evolution), so manifest == written
    // files by construction, and older narrower files upcast at read
    // (Spark 4 parquet widening; asserted in TableOpsSpec).
    var mergedSchema: StructType = stamped.schema

    val newParts: Map[String, String] = oldParts match {
      case None =>
        // First commit. Refuse to adopt a dir holding FOREIGN data (the
        // bare-parquet interop case snapshot() reads): publishing a
        // manifest over it would hide those rows from every reader and
        // leave them untracked. Orphan commit-shaped dirs from a
        // crashed first write are fine — clean() collects them.
        if (fs.exists(new Path(t.dataPath))) {
          val foreign = fs.listStatus(new Path(t.dataPath))
            .filterNot(st => CommitDirPattern.matches(st.getPath.getName))
          require(foreign.isEmpty,
            s"table ${t.name}: ${t.dataPath} already holds non-graft data " +
              s"(e.g. ${foreign.head.getPath.getName}); import it with an " +
              "explicit upsert from a read of that dir into a fresh table")
        }
        guardRetiredNames(log, t, None, mergedSchema)
        writer(stamped, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        relsOf(fs, dest, t.partitionBy.length).map(_ -> ts).toMap
      case Some(_) if t.partitionBy.isEmpty =>
        val existing = snapshot(spark, t)
        val merged = mergeFn(existing, stamped, t.recordKey,
          Seq(t.precombineKey, KeyedTable.CommitCol))
        mergedSchema = merged.schema
        // retired-name tripwire BEFORE the COW rewrite — a refused
        // re-add must not pay a table rewrite and strand an orphan dir
        guardRetiredNames(log, t, schemaAt(spark, t, None), mergedSchema)
        writer(merged, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        Map("" -> ts)
      case Some(old) =>
        val existing = snapshot(spark, t)
        val keyCols = t.recordKey
        // Affected partitions: the increment's own partitions — plus,
        // for GLOBAL tables, the partitions where an incoming key
        // already lives (key-moved-partition ⇒ old row must go). Old
        // homes come from the persisted bucketed KeyIndex, NEVER from
        // a snapshot scan: at 100 TB with daily increments a
        // full-table semi-join per upsert is the dominant cost
        // (VERDICT r1 #2). Distinct partition values are tiny;
        // collecting them is metadata-sized.
        val incomingParts =
          stamped.select(t.partitionBy.map(col): _*).distinct()
        val affectedDf =
          if (!t.globalIndex) incomingParts
          else {
            // bootstrap + crash-recovery in one probe: rebuild unless
            // the index is stamped with the SAME base commit the
            // tripwire asserts at publish — a fresh latestCommit() here
            // could stamp a rebuild-from-our-base as synced to an
            // interloper's newer commit, surviving our aborted publish
            KeyIndex.ensureFresh(spark, t, baseCommit, existing)
            incomingParts
              .union(KeyIndex.lookupPartitions(spark, t, stamped))
              .distinct()
          }
        val affected = affectedDf.collect()
        val partFilter =
          partitionPredicate(t.partitionBy, affectedDf.schema, affected)
        // Partition pruning keeps this scan to the affected dirs.
        val affectedExisting = existing.filter(partFilter)
        // Merge under the table's ROW IDENTITY (rowIdentity: partition-
        // scoped matching merges a key only against its own partition —
        // Hudi BLOOM default; GLOBAL matches table-wide) — the single
        // definition every other write path uses.
        val merged = mergeFn(affectedExisting, stamped, t.rowIdentity,
          Seq(t.precombineKey, KeyedTable.CommitCol))
        mergedSchema = merged.schema
        guardRetiredNames(log, t, schemaAt(spark, t, None), mergedSchema)
        writer(merged, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        // Ownership update: affected rels move to the new commit dir
        // (or drop entirely when a moved-away key emptied them); the
        // rels actually present under the new dir are authoritative.
        val affectedRels = backingRels(spark, t, fs, affectedExisting).keySet
        val written = relsOf(fs, dest, t.partitionBy.length)
        old -- affectedRels ++ written.map(_ -> ts)
    }

    // Column-stats sidecar before the publish: a crash here leaves an
    // orphan dir, never a published commit with a missing sidecar.
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, Some(mergedSchema))
    // Manifest FIRST (it is the publish point — a key recorded for an
    // unpublished commit would make a replay skip a batch whose data is
    // an invisible orphan: silent loss). The marker after it is only a
    // cache; hasIdempotencyKey falls back to the manifests for the
    // crash window between the two.
    log.logCommit(ts, Map(
      "table" -> t.name,
      "schema" -> mergedSchema.json,
      PartsKey -> partsJson(newParts)) ++
      idempotencyKey.map("idempotency_key" -> _) ++
      rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    idempotencyKey.foreach(log.recordIdempotencyKey)
    // GLOBAL tables: record the new home partition of every key this
    // commit wrote, AFTER the publish (the index stamps the commit it
    // reflects; a crash anywhere in between is caught by the next
    // writer's ensureFresh probe and costs one rebuild, never a wrong
    // lookup). Reading back the just-written commit dir (under the
    // merged schema — declared partition types) is exact: a key whose
    // EXISTING row won the precombine keeps its old home, rides in the
    // new dir with its OLD _commit_ts, and is filtered out.
    if (t.globalIndex && t.partitionBy.nonEmpty) {
      val written = spark.read.schema(mergedSchema)
        .option("basePath", dest.toString).parquet(dest.toString)
      if (!KeyIndex.exists(spark, t))
        KeyIndex.rebuild(spark, t, written)
      else
        KeyIndex.update(spark, t,
          written.filter(col(KeyedTable.CommitCol) === lit(ts)))
      KeyIndex.markSynced(spark, t, ts)
    }
    ts
  }

  /** METADATA-ONLY bootstrap — Hudi's `bootstrap` operation
    * (`METADATA_ONLY` mode): adopt an existing plain-parquet dataset
    * as the table's first commit WITHOUT rewriting, copying, or moving
    * a byte. Adoption is BY REFERENCE (what Hudi's METADATA_ONLY mode
    * actually does — skeleton metadata points at the source files in
    * place): the commit's parts map claims the partition rels, and a
    * durable external-root record ([[graft.tables.CommitLog
    * .externalRoots]]) resolves the adopted ver to the source dir, so
    * every reader scans the source files where they already live. No
    * rename happens — the engine's object-store invariant (no data
    * file or dir is ever renamed; S3A dir rename is a non-atomic
    * per-object copy+delete) holds on this path too, and the operation
    * is O(#partition-dirs) LISTs regardless of data size, on ANY
    * store. The manifest schema is the source footer schema widened
    * with `_commit_ts`, so bootstrapped rows read back with a NULL
    * commit stamp. Null is exactly right: every merge path orders the
    * precombine struct with null-first, so a bootstrapped row loses
    * precombine TIES to any stamped write (the same outcome a
    * FULL_RECORD import would produce) while still winning on a
    * genuinely greater precombine value. Incremental and CDC reads
    * emit nothing for the bootstrap commit — no row carries its
    * stamp — matching Hudi's documented behavior that downstream
    * consumers begin FROM the bootstrap instant.
    *
    * Lifecycle of adopted files: later COW writes migrate touched
    * partitions into ordinary commit dirs (ownership moves in the
    * parts map); the adopted source files themselves are NEVER deleted
    * by [[clean]] — the engine does not destroy data it didn't write.
    * Once no retained manifest references the adopted ver, the source
    * dir is simply no longer read.
    *
    * Refused when the table already exists, when the source already
    * carries a `_commit_ts` column, when the source lies inside the
    * table root, and for stats-carrying tables (column-stats sidecars
    * would need the full scan this operation exists to avoid — use an
    * upsert import, the FULL_RECORD analog, or declare the table
    * without statsColumns and compact later). Partitioned tables
    * expect the source laid out hive-style under matching partition
    * dirs.
    */
  def bootstrap(spark: SparkSession, t: KeyedTable,
      srcDir: String): String = {
    require(!exists(spark, t),
      s"table ${t.name} already exists — bootstrap adopts only a fresh table")
    require(t.statsColumns.isEmpty,
      s"table ${t.name}: metadata-only bootstrap cannot produce " +
        "column-stats sidecars (that needs a scan) — import via upsert " +
        "or drop statsColumns")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val src = new Path(srcDir)
    require(fs.exists(src), s"bootstrap source $srcDir does not exist")
    val srcQ = fs.makeQualified(src)
    val rootQ = fs.makeQualified(new Path(t.path))
    require(srcQ != rootQ && !srcQ.toString.startsWith(rootQ.toString + "/"),
      s"bootstrap source $srcDir lies inside table root ${t.path} — " +
        "adopt-in-place would alias the table's own layout")
    // symmetric guard: adopting an ANCESTOR of the table root would
    // make backingRels' external-root prefix match claim every later
    // commit dir under data/ for the bootstrap ver, corrupting
    // affected-partition discovery for every subsequent upsert/delete
    require(!rootQ.toString.startsWith(srcQ.toString + "/"),
      s"table root ${t.path} lies inside bootstrap source $srcDir — " +
        "the table's own commit dirs would alias the adopted root")
    val srcSchema = spark.read.parquet(srcDir).schema
    require(!srcSchema.fieldNames.contains(KeyedTable.CommitCol),
      s"bootstrap source already carries ${KeyedTable.CommitCol} — " +
        "it looks like graft table data, not a foreign dataset")
    (t.recordKey ++ t.partitionBy :+ t.precombineKey).distinct.foreach(c =>
      require(srcSchema.fieldNames.contains(c),
        s"bootstrap source lacks declared column '$c'"))
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    require(baseCommit.isEmpty,
      s"table ${t.name} has commits — bootstrap must be first")
    val ts = CommitLog.newCommitTs()
    val rels = relsOf(fs, srcQ, t.partitionBy.length)
    require(rels.nonEmpty,
      s"bootstrap source holds no partition dirs at depth " +
        s"${t.partitionBy.length}")
    val schema = StructType(srcSchema.fields :+
      StructField(KeyedTable.CommitCol, StringType, nullable = true))
    // root record BEFORE the manifest: a crash in between leaves an
    // unreferenced entry (harmless), never a published commit whose
    // files cannot be resolved
    log.recordExternalRoot(ts, srcQ.toString)
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "bootstrap",
      "external_root" -> srcQ.toString,
      "schema" -> schema.json,
      PartsKey -> partsJson(rels.map(_ -> ts).toMap)),
      expectedPrev = Some(baseCommit))
    ts
  }

  /** Structural columns no schema surgery may touch: the merge/
    * partition machinery is name-keyed on all of them.
    */
  private def structuralCols(t: KeyedTable): Set[String] =
    (t.recordKey ++ t.partitionBy :+ t.precombineKey).toSet +
      KeyedTable.CommitCol + DeletedCol

  private def schemaSurgeryGuards(spark: SparkSession, t: KeyedTable,
      colName: String, op: String): Unit = {
    require(!structuralCols(t).contains(colName),
      s"table ${t.name}: cannot $op structural column '$colName' " +
        "(key/partition/precombine/system columns are name-keyed " +
        "throughout the engine)")
    require(!t.statsColumns.contains(colName),
      s"table ${t.name}: cannot $op stats-tracked column '$colName' — " +
        "the column-stats sidecars and their pruned reads are " +
        "name-keyed; drop it from statsColumns (new descriptor) first")
    require(!SecondaryIndex.exists(spark, t, colName),
      s"table ${t.name}: cannot $op column '$colName' while it has a " +
        "live secondary index — drop the index first")
  }

  /** Non-additive schema evolution: COLUMN RENAME via column mapping
    * (the Hudi 1.0 / Delta `columnMapping` analog — Delta renames a
    * column by re-mapping names to immutable physical ids so old
    * files stay readable; here the manifest schema carries the
    * logical names and a durable rename lineage maps each commit dir
    * back to its physical names, see
    * [[graft.tables.CommitLog.renames]]). Metadata-only: republishes
    * the manifest schema with the field renamed — no data file is
    * read, touched, or rewritten; O(1) regardless of table size.
    * Works on live-MOR state (delta dirs ride the same lineage).
    *
    * Time travel across the rename is EXACT: an as-of read before the
    * rename sees the old name (that manifest's schema), a read after
    * it the new, with identical cell values — the rename-walk no-ops
    * on entries the read schema postdates or predates. Renaming a
    * column BACK to a prior name later is also sound (the walk
    * resolves each ver's era correctly); only re-ADDING a retired
    * name as a brand-new column is refused (see [[dropColumn]]).
    *
    * Refused for structural columns (record key / partition /
    * precombine / system), stats-tracked columns and columns under a
    * live secondary index (both pipelines are name-keyed), when the
    * target name exists or was retired by a DROP, and for pre-schema
    * legacy tables.
    */
  def renameColumn(spark: SparkSession, t: KeyedTable,
      oldName: String, newName: String): String = {
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    require(baseCommit.nonEmpty,
      s"table ${t.name} has no commits — nothing to rename")
    val sch = latestSchema(spark, t).getOrElse(
      throw new IllegalArgumentException(
        s"table ${t.name} is a pre-schema legacy table — column " +
          "mapping needs a manifest schema"))
    require(sch.fieldNames.contains(oldName),
      s"table ${t.name}: no column '$oldName' to rename")
    require(!sch.fieldNames.contains(newName),
      s"table ${t.name}: target column '$newName' already exists")
    require(oldName != newName, "rename to the same name is a no-op")
    schemaSurgeryGuards(spark, t, oldName, "rename")
    // the TARGET must not collide with structural/system names either:
    // renaming onto `_deleted` would turn a payload column into the
    // soft-delete flag (silently hiding rows or breaking every read)
    require(!structuralCols(t).contains(newName),
      s"table ${t.name}: cannot rename to structural/system name " +
        s"'$newName'")
    require(!log.droppedColumns().contains(newName),
      s"table ${t.name}: '$newName' was retired by a column drop — " +
        "pre-drop files still store data under that physical name; " +
        "pick a fresh name")
    // the target must not be a RETIRED pre-rename physical name of a
    // DIFFERENT column either: after rename a→b, files written in
    // the a→b era store 'b', but the stale (ts,a,b) lineage entry
    // would forward-map a REUSED 'a' (renamed from some c) onto 'b'
    // too — a duplicate physical schema that poisons every read of
    // that era. The one sound reuse is renaming the SAME column back:
    // the lineage chain from newName must resolve to oldName.
    val priorOldNames = log.renames().map(_._2).toSet
    if (priorOldNames.contains(newName)) {
      val resolved = log.renames().foldLeft(newName) {
        case (cur, (_, o, n)) => if (cur == o) n else cur
      }
      require(resolved == oldName,
        s"table ${t.name}: '$newName' is a retired physical name of a " +
          s"different column (its lineage resolves to '$resolved', not " +
          s"'$oldName') — reusing it would alias old files' bytes; " +
          "pick a fresh name")
    }
    val (parts, deltas) = currentState(spark, t, None).getOrElse(
      throw new IllegalStateException(
        s"table ${t.name}: no parseable manifest state"))
    val ts = CommitLog.newCommitTs()
    val newSch = StructType(sch.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    // lineage record BEFORE the manifest — an orphan entry is inert
    // (substitution only fires when a read schema carries the new
    // name, which only the published manifest introduces)
    log.recordRename(ts, oldName, newName)
    // lost-update tripwire for the lineage itself: a contract-
    // violating concurrent rename could overwrite the record in the
    // read-modify-write window — re-read before the manifest makes a
    // schema_rename without its lineage entry durable
    require(log.renames().contains((ts, oldName, newName)),
      s"table ${t.name}: rename lineage record lost — concurrent " +
        "writer violated the single-writer contract; rename NOT published")
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "schema_rename",
      "renamed_from" -> oldName,
      "renamed_to" -> newName,
      "schema" -> newSch.json,
      PartsKey -> partsJson(parts)) ++
      (if (deltas.nonEmpty) Map(DeltasKey -> deltasJson(deltas))
       else Map.empty),
      expectedPrev = Some(baseCommit))
    ts
  }

  /** Non-additive schema evolution: COLUMN DROP. Metadata-only — the
    * manifest schema narrows and every reader's explicit-schema scan
    * simply stops projecting the physical column; no file is
    * rewritten (the bytes age out as commits rewrite partitions —
    * Delta's drop-column behaves identically; use a full-partition
    * rewrite for right-to-be-forgotten semantics). The dropped name
    * (and, for a previously-renamed column, its whole physical
    * lineage) is RETIRED: additive evolution refuses to re-add it,
    * because pre-drop files still store values under that name and a
    * re-added column would silently resurrect them on old-file reads.
    * Time travel before the drop still sees the column. Same refusal
    * set as [[renameColumn]].
    */
  def dropColumn(spark: SparkSession, t: KeyedTable,
      colName: String): String = {
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    require(baseCommit.nonEmpty,
      s"table ${t.name} has no commits — nothing to drop")
    val sch = latestSchema(spark, t).getOrElse(
      throw new IllegalArgumentException(
        s"table ${t.name} is a pre-schema legacy table — column " +
          "mapping needs a manifest schema"))
    require(sch.fieldNames.contains(colName),
      s"table ${t.name}: no column '$colName' to drop")
    schemaSurgeryGuards(spark, t, colName, "drop")
    val (parts, deltas) = currentState(spark, t, None).getOrElse(
      throw new IllegalStateException(
        s"table ${t.name}: no parseable manifest state"))
    val ts = CommitLog.newCommitTs()
    val newSch = StructType(sch.fields.filterNot(_.name == colName))
    // retire the dropped name AND its physical ancestors (a column
    // renamed o→n then dropped leaves files storing o and files
    // storing n — re-adding either would resurrect)
    val lineage = {
      val rens = log.renames()
      var acc = Set(colName)
      var grew = true
      while (grew) {
        val next = acc ++ rens.collect {
          case (_, o, n) if acc(n) => o
        }
        grew = next.size > acc.size
        acc = next
      }
      acc
    }
    lineage.foreach(log.recordDropped)
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "schema_drop",
      "dropped" -> colName,
      "schema" -> newSch.json,
      PartsKey -> partsJson(parts)) ++
      (if (deltas.nonEmpty) Map(DeltasKey -> deltasJson(deltas))
       else Map.empty),
      expectedPrev = Some(baseCommit))
    ts
  }

  /** Additive-evolution tripwire against resurrecting retired names:
    * a column in `merged` that is NEW relative to `current` must not
    * collide with a name retired by [[dropColumn]] or left behind as
    * a pre-rename physical name — old files still store data under
    * it, and the rename-walk would alias the new column onto those
    * bytes. Probes the retired records only when the commit actually
    * adds columns (the steady-state write pays nothing).
    */
  private def guardRetiredNames(log: CommitLog, t: KeyedTable,
      current: Option[StructType], merged: StructType): Unit = {
    val cur = current.map(_.fieldNames.toSet).getOrElse(Set.empty[String])
    val added = merged.fieldNames.filterNot(cur)
    if (added.isEmpty) return
    val retired = log.droppedColumns() ++ log.renames().map(_._2)
    val clash = added.filter(retired)
    require(clash.isEmpty,
      s"table ${t.name}: cannot re-add retired column(s) " +
        s"${clash.mkString(", ")} — files from before the original " +
        "drop/rename still store data under that physical name, and a " +
        "re-added column would silently resurrect those values. Use a " +
        "new name.")
  }

  /** INSERT (no-dedup) — Hudi's `insert` write operation (the third
    * value of `hoodie.datasource.write.operation` next to the `upsert`
    * the reference pins, create_hudi_tables.py:124, and the
    * `insert_overwrite` family): rows are ADDED to the table with no
    * key lookup, no precombine dedup and no replacement — a key
    * already present ends up with MULTIPLE rows, exactly as Hudi
    * documents for insert with combine-before-insert off. The bulk
    * data-load path: first commit on a fresh table writes the batch
    * as-is (Hudi's `bulk_insert` shape — zero reads); later commits
    * rewrite only the touched partitions as existing ∪ batch (COW
    * small-file handling — Hudi's insert also merges into existing
    * file groups on COW).
    *
    * Duplicate keys are first-class in the snapshot read (no merge
    * happens on a pure-COW read path); a LATER [[upsert]] collapses a
    * duplicated key to its greatest-precombine version, matching
    * Hudi's upsert-after-insert behavior. Refused for GLOBAL-indexed
    * tables: a global key index presumes table-wide key uniqueness,
    * which this operation exists to break.
    *
    * Shares upsert's commit protocol: idempotency-key replay
    * protection, MOR-delta fold first, additive schema evolution,
    * lost-update tripwire, stats sidecar before publish.
    */
  def insertInto(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      idempotencyKey: Option[String] = None): String =
    serviceGuard(spark, t)(insertIntoUnlocked(spark, t, incoming, sortBy,
      maxRecordsPerFile, idempotencyKey))

  private def insertIntoUnlocked(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      sortBy: Seq[String],
      maxRecordsPerFile: Long,
      idempotencyKey: Option[String]): String = {
    require(!t.globalIndex,
      s"table ${t.name}: insert (no-dedup) is undefined under a GLOBAL " +
        "key index — use upsert, or a non-global table")
    val log = CommitLog(t, spark)
    idempotencyKey.foreach { key =>
      if (log.hasIdempotencyKey(key)) return ""
    }
    if (incoming.isEmpty) return ""
    if (liveDeltas(spark, t).nonEmpty) compactDeltas(spark, t)
    val baseCommit = log.latestCommit()
    val ts = CommitLog.newCommitTs()
    val stamped = incoming.withColumn(KeyedTable.CommitCol, lit(ts))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val dest = new Path(s"${t.dataPath}/$ts")
    val oldParts = currentParts(spark, t, None)
    var mergedSchema: StructType = stamped.schema
    val newParts: Map[String, String] = oldParts match {
      case None =>
        // same foreign-data guard as the first upsert commit
        if (fs.exists(new Path(t.dataPath))) {
          val foreign = fs.listStatus(new Path(t.dataPath))
            .filterNot(st => CommitDirPattern.matches(st.getPath.getName))
          require(foreign.isEmpty,
            s"table ${t.name}: ${t.dataPath} already holds non-graft data " +
              s"(e.g. ${foreign.head.getPath.getName}); import it with an " +
              "explicit upsert from a read of that dir into a fresh table")
        }
        guardRetiredNames(log, t, None, mergedSchema)
        writer(stamped, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        relsOf(fs, dest, t.partitionBy.length).map(_ -> ts).toMap
      case Some(_) if t.partitionBy.isEmpty =>
        val appended = snapshot(spark, t)
          .unionByName(stamped, allowMissingColumns = true)
        mergedSchema = appended.schema
        guardRetiredNames(log, t, schemaAt(spark, t, None), mergedSchema)
        writer(appended, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        Map("" -> ts)
      case Some(old) =>
        // Affected partitions are the batch's own — no key-moved-home
        // resolution exists here (nothing is replaced), so the
        // partition-scoped rewrite needs no index probe at any scale.
        val existing = snapshot(spark, t)
        val incomingParts =
          stamped.select(t.partitionBy.map(col): _*).distinct()
        val affected = incomingParts.collect()
        val partFilter =
          partitionPredicate(t.partitionBy, incomingParts.schema, affected)
        val affectedExisting = existing.filter(partFilter)
        val appended = affectedExisting
          .unionByName(stamped, allowMissingColumns = true)
        mergedSchema = appended.schema
        guardRetiredNames(log, t, schemaAt(spark, t, None), mergedSchema)
        writer(appended, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        val affectedRels = backingRels(spark, t, fs, affectedExisting).keySet
        val written = relsOf(fs, dest, t.partitionBy.length)
        old -- affectedRels ++ written.map(_ -> ts)
    }
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, Some(mergedSchema))
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "insert",
      "schema" -> mergedSchema.json,
      PartsKey -> partsJson(newParts)) ++
      idempotencyKey.map("idempotency_key" -> _) ++
      rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    idempotencyKey.foreach(log.recordIdempotencyKey)
    ts
  }

  /** MOR delta commit — the fast write path of Hudi's MERGE_ON_READ
    * table type (the half of the Hudi surface the reference's COW
    * config leaves off; see [[Mor]]). Writes ONLY the deduped,
    * stamped batch as a new `data/{ts}` dir and republishes the
    * UNCHANGED base partition map with `ts` appended to the manifest's
    * delta list — no base rewrite, O(batch) bytes per commit
    * regardless of how many partitions the batch grazes. Readers
    * ([[snapshot]], [[snapshotWhere]], [[incremental]]) merge live
    * deltas on the fly (real-time view); [[compactDeltas]] folds them
    * back to pure-COW state on a schedule.
    *
    * Same contracts as [[upsert]]: within-batch precombine dedup under
    * the table's row identity, idempotency-key replay protection,
    * additive schema evolution (the manifest records the union-coerced
    * schema), lost-update tripwire. First commit on a fresh table
    * delegates to [[upsert]] (the first file slice IS a base file).
    *
    * GLOBAL-indexed partitioned tables work too: the real-time view
    * merges on the bare record key (table-wide uniqueness holds in
    * every read), and old-home resolution — the work a delta commit
    * defers — happens once at [[compactDeltas]] via the persisted
    * [[KeyIndex]], which stays synced to the BASE state (delta commits
    * never touch it).
    */
  /** `inlineCompactAfter = Some(n)` arms the inline-compaction policy
    * (Hudi `hoodie.compact.inline` + `max.delta.commits` analog): when
    * THIS delta commit brings the live-delta count to ≥ n, a
    * [[compactDeltas]] runs as a follow-on table-service commit before
    * returning — write amplification stays bounded (every base rewrite
    * folds ≥ n deltas) without an out-of-band scheduler, the trade the
    * reference's @daily batch cannot make. Returns the DELTA commit's
    * ts either way (the compaction is its own timeline instant).
    */
  def deltaCommit(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      maxRecordsPerFile: Long = 4000000L,
      idempotencyKey: Option[String] = None,
      inlineCompactAfter: Option[Int] = None): String =
    serviceGuard(spark, t)(deltaCommitUnlocked(spark, t, incoming,
      maxRecordsPerFile, idempotencyKey, inlineCompactAfter))

  private def deltaCommitUnlocked(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      maxRecordsPerFile: Long,
      idempotencyKey: Option[String],
      inlineCompactAfter: Option[Int]): String = {
    inlineCompactAfter.foreach(n => require(n >= 1,
      s"inlineCompactAfter must be >= 1, got $n"))
    if (!exists(spark, t))
      return upsert(spark, t, incoming,
        maxRecordsPerFile = maxRecordsPerFile,
        idempotencyKey = idempotencyKey)
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    idempotencyKey.foreach { key =>
      if (log.hasIdempotencyKey(key)) {
        // replay: the delta already published on a previous attempt.
        // If that attempt crashed between publishing and its follow-on
        // inline compaction, the live-delta count still sits >= n —
        // re-evaluate the policy here so the replay retries the
        // compaction and the write-amplification bound is honored
        // under foreachBatch retries, not just on the next threshold
        // crossing.
        inlineCompactAfter.foreach { n =>
          val live = currentState(spark, t, None)
            .map(_._2.size).getOrElse(0)
          if (live >= n) compactDeltas(spark, t, maxRecordsPerFile): Unit
        }
        return ""
      }
    }
    if (incoming.isEmpty) return ""
    val ts = CommitLog.newCommitTs()
    val deduped = Upsert.dedupBatch(incoming, t.rowIdentity,
      Seq(t.precombineKey))
    val stamped = deduped.withColumn(KeyedTable.CommitCol, lit(ts))
    val (parts, oldDeltas) = currentState(spark, t, None).get
    val sch = latestSchema(spark, t)
    // union coercion against the CURRENT table schema — the same
    // widening a COW merge applies, so the recorded schema stays the
    // running union across base + every delta. Coerce against an EMPTY
    // frame built from the manifest schema, never a readParts plan:
    // DataFrameReader.parquet eagerly lists every referenced dir
    // (InMemoryFileIndex), which would make this "O(batch)" write pay
    // O(#partitions) object-store LISTs per kilobyte delta. Only
    // legacy schema-less tables fall back to the footer-sampled read.
    val mergedSchema: StructType = sch match {
      case Some(s) => spark
        .createDataFrame(spark.sparkContext.emptyRDD[Row], s)
        .unionByName(stamped, allowMissingColumns = true).schema
      case None if parts.isEmpty => stamped.schema
      case None => readParts(spark, t, parts, None)
        .unionByName(stamped, allowMissingColumns = true).schema
    }
    guardRetiredNames(log, t, sch, mergedSchema)
    val dest = new Path(s"${t.dataPath}/$ts")
    writer(stamped, t, Nil, maxRecordsPerFile).parquet(dest.toString)
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, Some(mergedSchema))
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "deltacommit",
      "schema" -> mergedSchema.json,
      PartsKey -> partsJson(parts),
      DeltasKey -> deltasJson(oldDeltas :+ ts)) ++
      idempotencyKey.map("idempotency_key" -> _) ++
      rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    idempotencyKey.foreach(log.recordIdempotencyKey)
    // inline-compaction policy: fires AFTER the delta publishes (the
    // delta commit itself is never at risk from a compaction failure)
    inlineCompactAfter.foreach { n =>
      if (oldDeltas.size + 1 >= n)
        compactDeltas(spark, t, maxRecordsPerFile): Unit
    }
    ts
  }

  /** Fold live MOR delta commits into a fresh COW commit — Hudi's
    * compaction. Partition-scoped: the partitions a delta touched are
    * discovered from the hive dirs under its commit dir (FS metadata,
    * no data scan); only those base partitions are merged and
    * rewritten, every other partition keeps its current dir. The new
    * manifest carries no delta list, so subsequent reads are plain
    * pruned scans again and [[clean]] collects the delta dirs once
    * their manifests age past retention. Visible rows are unchanged by
    * construction ([[Mor.mergedView]] uses the COW tie-break order);
    * returns the commit ts, or "" when there is nothing to fold.
    *
    * `sortBy` re-clusters the folded partitions (pass the record key
    * to keep per-file key ranges disjoint — what the MOR split read's
    * file skipping feeds on; see [[graft.tables.ColumnStats
    * .morSplitRead]]).
    */
  def compactDeltas(spark: SparkSession, t: KeyedTable,
      maxRecordsPerFile: Long = 4000000L,
      sortBy: Seq[String] = Nil): String =
    serviceGuard(spark, t)(compactDeltasUnlocked(spark, t,
      maxRecordsPerFile, sortBy))

  private def compactDeltasUnlocked(spark: SparkSession, t: KeyedTable,
      maxRecordsPerFile: Long,
      sortBy: Seq[String]): String = {
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    val (oldParts, deltas) = currentState(spark, t, None).getOrElse(return "")
    if (deltas.isEmpty) return ""
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val sch = latestSchema(spark, t)
    val ts = CommitLog.newCommitTs()
    val dest = new Path(s"${t.dataPath}/$ts")
    val deltaRows = Mor.readDeltas(spark, t, deltas, sch)
    var mergedSchema: StructType = null
    val newParts: Map[String, String] =
      if (t.partitionBy.isEmpty) {
        val merged = Mor.mergedView(
          readParts(spark, t, oldParts, sch), deltaRows, t)
        mergedSchema = merged.schema
        writer(merged, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        Map("" -> ts)
      } else if (!t.globalIndex) {
        val deltaRels = deltas.flatMap(d =>
          relsOf(fs, new Path(s"${t.dataPath}/$d"), t.partitionBy.length))
          .toSet
        val affected = oldParts.view.filterKeys(deltaRels.contains).toMap
        val merged = Mor.mergedView(
          readParts(spark, t, affected, sch), deltaRows, t)
        mergedSchema = merged.schema
        writer(merged, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        val written = relsOf(fs, dest, t.partitionBy.length)
        oldParts -- affected.keySet ++ written.map(_ -> ts)
      } else {
        // GLOBAL semantics: a delta may move a key between partitions,
        // so the fold must also rewrite the keys' OLD homes (the base
        // copy dies there). Old homes come from the persisted KeyIndex,
        // which delta commits deliberately never touch — it stays
        // synced to the BASE state, exactly what the fold needs
        // (ensureFresh heals a crashed/missing index from the
        // read-optimized base, never the merged view).
        val base = readParts(spark, t, oldParts, sch)
        KeyIndex.ensureFresh(spark, t, lastBaseCommit(spark, t), base)
        val affectedDf = deltaRows
          .select(t.partitionBy.map(col): _*).distinct()
          .union(KeyIndex.lookupPartitions(spark, t, deltaRows))
          .distinct()
        val affected = affectedDf.collect()
        val affectedExisting = base.filter(
          partitionPredicate(t.partitionBy, affectedDf.schema, affected))
        val merged = Mor.mergedView(affectedExisting, deltaRows, t)
        mergedSchema = merged.schema
        writer(merged, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
        val affectedRels = backingRels(spark, t, fs, affectedExisting).keySet
        val written = relsOf(fs, dest, t.partitionBy.length)
        oldParts -- affectedRels ++ written.map(_ -> ts)
      }
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, Some(mergedSchema))
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "compact",
      "schema" -> mergedSchema.json,
      PartsKey -> partsJson(newParts)) ++
      rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    // GLOBAL tables: the fold decided every delta key's final home —
    // record it (same post-publish contract as upsert: a crash here
    // costs the next writer one ensureFresh rebuild, never a wrong
    // lookup). Winners keep their rows in the written dir, so the
    // read-back restricted to the delta key set is exact.
    if (t.globalIndex && t.partitionBy.nonEmpty) {
      val written = spark.read.schema(mergedSchema)
        .option("basePath", dest.toString).parquet(dest.toString)
      val deltaKeys = deltaRows.select(t.recordKey.map(col): _*).distinct()
      KeyIndex.update(spark, t,
        written.join(deltaKeys, t.recordKey, "left_semi"))
      KeyIndex.markSynced(spark, t, ts)
    }
    ts
  }

  /** Schema recorded by the latest commit (None for pre-schema tables —
    * falls back to footer inference).
    */
  def latestSchema(spark: SparkSession, t: KeyedTable): Option[StructType] =
    schemaAt(spark, t, None)

  private def schemaAt(spark: SparkSession, t: KeyedTable,
      asOf: Option[String]): Option[StructType] = {
    val log = CommitLog(t, spark)
    val commits = log.listCommits()
    val candidates = asOf.fold(commits)(s => commits.filter(_ <= s))
    // Newest manifest that parses AND carries a schema: an unparseable
    // (truncated) or schema-less manifest falls back to the previous one
    // instead of dropping to footer inference.
    candidates.reverseIterator
      .flatMap(ts => log.commitMeta(ts).flatMap(_.get("schema")))
      .nextOption()
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
  }

  /** Snapshot read — latest table state (S1; the reference's
    * `spark.read.format("hudi").load(path)`,
    * incremental_etl_orders.py:385-386). Resolves the newest manifest's
    * partition→version map and scans exactly the referenced dirs; COW
    * keeps them always-latest, so no dedup view is needed at read time.
    *
    * MERGE_ON_READ state (live [[Mor]] delta commits in the manifest):
    * the snapshot is the base dirs merged with the delta dirs under the
    * same latest-version-per-row-identity semantics a COW upsert applies
    * at write time — Hudi's real-time (`_rt`) view.
    */
  def snapshot(spark: SparkSession, t: KeyedTable): DataFrame =
    currentState(spark, t, None) match {
      case Some((parts, deltas)) =>
        val sch = latestSchema(spark, t)
        val base = readParts(spark, t, parts, sch)
        if (deltas.isEmpty) base
        else Mor.mergedView(base, Mor.readDeltas(spark, t, deltas, sch), t)
      case None =>
        // No published commit: surface the standard path error (callers
        // guard with exists()); tolerate a bare parquet dir for
        // interop with externally-written data.
        spark.read.parquet(t.dataPath)
    }

  /** Read-optimized view (Hudi `_ro`): base files only, ignoring live
    * MOR delta commits — stale by up to the un-compacted deltas, but a
    * plain pruned columnar scan with no merge. Identical to
    * [[snapshot]] on pure-COW state.
    */
  def snapshotReadOptimized(spark: SparkSession, t: KeyedTable): DataFrame =
    currentParts(spark, t, None) match {
      case Some(parts) => readParts(spark, t, parts, latestSchema(spark, t))
      case None => spark.read.parquet(t.dataPath)
    }

  /** Exact row count of the current snapshot. Tables carrying
    * column-stats sidecars answer from METADATA (Σ per-file `rows`
    * over live files — no scan job at all; the Delta count-from-stats
    * optimization); anything else falls back to `snapshot().count()`.
    */
  def countFast(spark: SparkSession, t: KeyedTable): Long =
    currentState(spark, t, None) match {
      // metadata counting needs pure-COW state: live deltas may
      // supersede base rows, so the snapshot count is NOT Σ file rows
      case Some((parts, deltas)) if t.statsColumns.nonEmpty && deltas.isEmpty =>
        ColumnStats.rowCount(spark, t, parts)
          .getOrElse(readParts(spark, t, parts, latestSchema(spark, t)).count())
      case _ => snapshot(spark, t).count()
    }

  /** Predicate-pruned snapshot read — `snapshot(t).filter(pred)` with
    * file skipping via the column-stats index (see
    * [[graft.tables.ColumnStats]]; Hudi's data-skipping read path over
    * its column-stats metadata index, create_hudi_tables.py:176-183).
    * Only files whose recorded min/max admit a match are handed to the
    * scan; the full predicate is re-applied on top, so a conservative
    * (or absent) stats translation never changes results — tables
    * without declared `statsColumns` degrade to exactly
    * `snapshot().filter(pred)`.
    */
  def snapshotWhere(spark: SparkSession, t: KeyedTable,
      pred: Column): DataFrame =
    currentState(spark, t, None) match {
      case None => spark.read.parquet(t.dataPath).filter(pred)
      case Some((parts, deltas)) if deltas.nonEmpty =>
        // MERGE_ON_READ state: the merge must run BEFORE the row filter
        // (a pre-merge filter could drop the winning version of a key
        // and resurrect a superseded one) — but only for base files
        // that CAN hold a delta-superseded row. When the record key is
        // stats-tracked, one metadata-sized agg over the deltas yields
        // per-key-column [lo, hi] bounds; base files range-disjoint
        // from them on any key column are SAFE — merge-free and
        // predicate-pruned exactly like pure COW (the recovered Hudi
        // file-slice locality: with a key-clustered layout the merge
        // working set is a handful of files, not the table).
        val sch = latestSchema(spark, t)
        val deltaRows = Mor.readDeltas(spark, t, deltas, sch)
        def fullMerge() =
          Mor.mergedView(readParts(spark, t, parts, sch), deltaRows, t)
            .filter(pred)
        val trackable = sch.isDefined &&
          t.recordKey.forall(ColumnStats.trackedColumns(t).contains) &&
          parts.nonEmpty
        if (!trackable) fullMerge()
        else {
          val aggs = t.recordKey.flatMap(k => Seq(
            min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k"),
            sum(when(col(k).isNull, 1L).otherwise(0L)).as(s"n_$k")))
          val r = deltaRows.agg(aggs.head, aggs.tail: _*).head()
          val nullKeys = t.recordKey.exists(k =>
            Option(r.getAs[Any](s"n_$k")).forall(_.asInstanceOf[Long] > 0L))
          val ranges = t.recordKey.map(k =>
            (k, r.getAs[Any](s"lo_$k"), r.getAs[Any](s"hi_$k")))
          // null-keyed delta rows make range reasoning unsound — bail
          if (nullKeys || ranges.exists(x => x._2 == null || x._3 == null))
            fullMerge()
          else {
            val (safe, risky) =
              ColumnStats.morSplitRead(spark, t, parts, sch.get, pred, ranges)
            val riskyBase = risky.getOrElse(
              readParts(spark, t, Map.empty[String, String], sch))
            val merged = Mor.mergedView(riskyBase, deltaRows, t).filter(pred)
            safe.map(_.filter(pred)
              .unionByName(merged, allowMissingColumns = true))
              .getOrElse(merged)
          }
        }
      case Some((parts, _)) =>
        val sch = latestSchema(spark, t)
        val base =
          if (t.statsColumns.isEmpty) readParts(spark, t, parts, sch)
          else ColumnStats.prunedRead(spark, t, parts, sch, pred)
            // every file pruned — empty result, schema preserved
            .getOrElse(readParts(spark, t, parts, sch).filter(lit(false)))
        base.filter(pred)
    }

  /** Indexed point lookup — the Hudi RECORD_INDEX / metadata
    * bloom-filter point-read analog: the current rows of a set of
    * record keys without scanning the table. Two pruning layers do
    * the work on the small-probe path: the column-stats sidecar
    * drops FILES whose per-key [min,max] range excludes every probe
    * (a key-clustered layout reduces this to ~one file per probe),
    * and the parquet bloom filters every write stamps on the record
    * key ([[writer]]) drop ROW GROUPS inside the survivors at scan
    * time. MOR live-delta state stays correct for free —
    * [[snapshotWhere]]'s split read merges only range-overlapping
    * base files.
    *
    * The probe set becomes a single O(1)-depth IN literal, so it must
    * be driver-sized; a probe frame larger than `maxProbes` distinct
    * keys falls back automatically to a semi-join against
    * [[snapshot]] — the shuffle path a point-read API must not hide
    * behind a silently-huge literal (an analyzer-breaking 10⁶-entry
    * IN is the VERDICT-r1 partition-predicate lesson again).
    */
  def lookupKeys(spark: SparkSession, t: KeyedTable, keys: DataFrame,
      maxProbes: Int = 10000): DataFrame = {
    val probeCols = t.recordKey
    val probes = keys.select(probeCols.map(col): _*).distinct()
    // limit(n+1): decide the path without counting the probe frame
    val collected = probes.limit(maxProbes + 1).collect()
    if (collected.length > maxProbes)
      snapshot(spark, t).join(probes, probeCols, "left_semi")
    else if (collected.isEmpty)
      snapshot(spark, t).filter(lit(false))
    else
      snapshotWhere(spark, t,
        partitionPredicate(probeCols, probes.schema, collected))
  }

  /** Keyed hard delete — the Hudi `hoodie.datasource.write.operation=
    * delete` analog (and the GDPR/right-to-be-forgotten primitive a
    * training-data lake needs). `keys` carries the record-key columns;
    * matching rows are removed via a left-anti join and only the
    * partitions that actually contain matching keys are rewritten
    * (same partition-scoped COW as upsert). Returns the commit ts, or
    * "" when nothing matched.
    *
    * Note: rows vanish without tombstones — an incremental reader sees
    * the disappearance only via the commit log, not as delete records
    * (Hudi emits delete markers; callers needing CDC-style deletes
    * should soft-delete with a flag column instead).
    *
    * Partition scoping: on a partition-scoped (non-GLOBAL) table the
    * same key may legitimately live in several partitions. When the
    * `keys` frame ALSO carries the partition columns, matching is
    * scoped to (key, partition) — exactly Hudi's delete-with-
    * partition-path — so only the named copies die; a bare-key frame
    * keeps the historical "this key, wherever it lives" semantics.
    *
    * `idempotencyKey` gives the delete the same exactly-once replay
    * contract as [[upsert]]: an already-applied key skips the whole
    * operation, so replaying an old batch after a LATER batch
    * re-inserted the same record keys cannot wrongly re-delete them.
    * The key is consumed (marker recorded) even when nothing matched —
    * a replayed no-op must stay a no-op regardless of what committed
    * in between.
    */
  def delete(spark: SparkSession, t: KeyedTable, keys: DataFrame,
      idempotencyKey: Option[String] = None): String =
    serviceGuard(spark, t)(deleteUnlocked(spark, t, keys, idempotencyKey))

  private def deleteUnlocked(spark: SparkSession, t: KeyedTable,
      keys: DataFrame, idempotencyKey: Option[String]): String = {
    if (!exists(spark, t)) return ""
    val log = CommitLog(t, spark)
    // replay skip BEFORE any work — same ordering rationale as upsert
    idempotencyKey.foreach { key =>
      if (log.hasIdempotencyKey(key)) return ""
    }
    // same fold-first contract as upsert: the affected-file discovery
    // below needs a file-backed snapshot, not a merged MOR view
    if (liveDeltas(spark, t).nonEmpty) compactDeltas(spark, t)
    val baseCommit = log.latestCommit()
    val keyCols =
      if (t.partitionBy.forall(keys.columns.contains)) t.rowIdentity
      else t.recordKey
    val delKeys = keys.select(keyCols.map(col): _*).distinct()
    val preSchema = latestSchema(spark, t)
    val snap = snapshot(spark, t)
    // GLOBAL tables: the key index narrows the match scan to the keys'
    // home partitions instead of the whole snapshot.
    val existing =
      if (t.globalIndex && t.partitionBy.nonEmpty) {
        KeyIndex.ensureFresh(spark, t, baseCommit, snap)
        val homes = KeyIndex.lookupPartitions(spark, t, delKeys)
        snap.filter(
          partitionPredicate(t.partitionBy, homes.schema, homes.collect()))
      } else snap
    // NULL-SAFE (<=>) matching: a row in the hive default partition
    // carries a null partition value (supported throughout — see
    // partitionPredicate's null-tuple arm); EqualTo would silently
    // never match it, turning its deletion into a no-op. Aliased
    // frames keep the refs unambiguous when delKeys derives from this
    // same table's files.
    val k = delKeys.alias("_gk")
    def matchCond(left: String): Column = keyCols
      .map(c => col(s"$left.$c") <=> col(s"_gk.$c")).reduce(_ && _)
    // file name attached BEFORE the key join: delKeys may itself be
    // file-backed (deleteWhere's discovered keys, a keys-table read),
    // and input_file_name() over the joined plan would be multi-source
    val matched = existing.withColumn("_graft_file", input_file_name())
      .alias("_ge").join(k, matchCond("_ge"), "left_semi")
    if (matched.isEmpty) {
      idempotencyKey.foreach(log.recordIdempotencyKey)
      return ""
    }
    val ts = CommitLog.newCommitTs()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val dest = new Path(s"${t.dataPath}/$ts")
    val oldParts = currentParts(spark, t, None).getOrElse(Map.empty)

    val newParts: Map[String, String] =
      if (t.partitionBy.isEmpty) {
        val remaining = existing.alias("_ge")
          .join(k, matchCond("_ge"), "left_anti")
        writer(remaining, t, Nil, 4000000L).parquet(dest.toString)
        Map("" -> ts)
      } else {
        val affected = backingRels(spark, t, fs, matched,
          fileCol = Some("_graft_file"))
        // Re-read ONLY the affected dirs (the same per-version grouped
        // read snapshot() uses) under the MANIFEST schema: footer
        // sampling could drop evolved columns from the rewrite, and
        // partition-type inference could re-identify a numeric-string
        // partition value (month=01 read back as int 1) — both silent
        // data corruption (ADVICE r1).
        val affectedExisting = readParts(spark, t, affected, preSchema)
        val remaining = affectedExisting.alias("_ge")
          .join(k, matchCond("_ge"), "left_anti")
        writer(remaining, t, Nil, 4000000L).parquet(dest.toString)
        val written = relsOf(fs, dest, t.partitionBy.length)
        oldParts -- affected.keySet ++ written.map(_ -> ts)
      }
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, preSchema)
    log.logCommit(ts,
      Map("table" -> t.name, "action" -> "delete",
        PartsKey -> partsJson(newParts)) ++
        preSchema.map("schema" -> _.json) ++
        idempotencyKey.map("idempotency_key" -> _) ++
        rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    idempotencyKey.foreach(log.recordIdempotencyKey)
    // index maintenance after the publish — same recovery contract as
    // upsert (ensureFresh rebuilds on the next write if we crash here)
    if (t.globalIndex && t.partitionBy.nonEmpty && KeyIndex.exists(spark, t)) {
      KeyIndex.remove(spark, t, delKeys)
      KeyIndex.markSynced(spark, t, ts)
    }
    ts
  }

  /** Predicate hard delete — the Delta `DELETE WHERE` / Hudi SQL
    * DELETE analog, composed from the two primitives the engine
    * already has: the keys to remove are DISCOVERED through
    * [[snapshotWhere]] (on stats-carrying tables a selective predicate
    * on a clustered column opens only files that can match — the
    * discovery scan is file-skipped, not a full pass), then the keyed
    * [[delete]] rewrite proceeds partition-scoped as usual. Returns
    * the commit ts, or "" when nothing matched.
    *
    * The discovered key set is MATERIALIZED to a table-scoped scratch
    * dir before the rewrite (removed in finally): (a) [[delete]]'s
    * affected-partition discovery uses `input_file_name()`, which
    * Spark only allows over a single file source — keys whose lineage
    * is the same table would make that plan multi-source; (b) the
    * (possibly expensive) discovery scan runs exactly once instead of
    * once per reference inside the rewrite. Distributed write, no
    * driver-side key collection — a GDPR-scale key set never funnels
    * through the driver.
    */
  def deleteWhere(spark: SparkSession, t: KeyedTable,
      pred: Column): String = {
    if (!exists(spark, t)) return ""
    // partition columns ride along on partition-scoped tables so only
    // the partition copies the predicate MATCHED are deleted — a bare
    // key set would kill same-key rows in unrelated partitions
    withScratch(spark, t, "deletewhere") { tmp =>
      snapshotWhere(spark, t, pred).select(t.rowIdentity.map(col): _*)
        .write.mode("overwrite").parquet(tmp.toString)
      delete(spark, t, spark.read.parquet(tmp.toString))
    }
  }

  /** CDC merge — apply a change batch carrying an op column
    * (`I`/`U` upserts, `D` deletes) in one call: the
    * debezium-payload workflow the reference's Hudi jobs exist for
    * (op-aware MERGE INTO). Per key, the LATEST change by
    * `precombineKey` wins — a key updated then deleted inside one
    * batch is deleted, never resurrected by its own earlier update
    * (same `max_by` discipline as upsert's batch dedup, with `D`
    * deterministically winning EQUAL-precombine ties: with a coarse
    * precombine column, arrival order is unknowable and a tombstone
    * resurrected by its own update would be silent data corruption —
    * the safe side of the tie is staying deleted).
    *
    * Ops are validated row-level (codegen'd, no extra pass): anything
    * other than `I`/`U`/`D` — including NULL and lowercase debezium
    * codes — fails the job loudly instead of silently mis-routing.
    * On partition-scoped tables the change row's PARTITION columns
    * scope the op (per-(key, partition) dedup and delete — the same
    * contract as [[delete]]/[[upsert]] there); on GLOBAL tables the
    * key alone identifies the row.
    *
    * Publishes up to TWO commits (upserts, then deletes) and returns
    * their timestamps. The intermediate state (upserts applied,
    * deletes pending) is itself consistent. With `idempotencyKey` set,
    * BOTH halves carry derived keys (`:up` / `:del`), so any replay —
    * in order or after later batches landed — re-applies each half at
    * most once; in particular an old batch's delete half cannot
    * re-delete a key a LATER batch re-inserted. Change batches may be
    * file-backed (a staged CDC table) — both halves tolerate a second
    * file source.
    */
  def applyChanges(spark: SparkSession, t: KeyedTable, changes: DataFrame,
      opCol: String = "_op",
      idempotencyKey: Option[String] = None): Seq[String] = {
    require(changes.columns.contains(opCol),
      s"applyChanges needs the op column '$opCol' (I/U/D)")
    val missingId = t.rowIdentity.filterNot(changes.columns.contains)
    require(missingId.isEmpty,
      s"applyChanges: changes frame is missing row-identity columns " +
        s"${missingId.mkString(", ")} — on a partition-scoped table row " +
        "identity is (key, partition), so the partition columns must " +
        "ride along on every change row (same contract as delete/upsert)")
    val validated = changes.withColumn(opCol,
      when(col(opCol).isin("I", "U", "D"), col(opCol))
        .otherwise(raise_error(format_string(
          s"applyChanges: invalid $opCol '%s' (need I/U/D)",
          coalesce(col(opCol), lit("NULL"))))))
    // latest op per row identity decides its fate; D outranks same-
    // precombine I/U. The dedup result is MATERIALIZED to table
    // scratch once (same discipline as deleteWhere): the upsert and
    // delete halves together reference it ~5 times, and an expensive
    // change lineage (a decoded topic dump, a join) must not re-run
    // per reference.
    val latest = Upsert.dedupBatch(
      validated.withColumn("_op_rank",
        when(col(opCol) === "D", 1).otherwise(0)),
      t.rowIdentity, Seq(t.precombineKey, "_op_rank")).drop("_op_rank")
    withScratch(spark, t, "applychanges") { tmp =>
      latest.write.mode("overwrite").parquet(tmp.toString)
      val staged = spark.read.parquet(tmp.toString)
      val ups = staged.filter(col(opCol) =!= "D").drop(opCol)
      val dels = staged.filter(col(opCol) === "D")
        .select(t.rowIdentity.map(col): _*)
      val upTs = upsert(spark, t, ups,
        idempotencyKey = idempotencyKey.map(_ + ":up"))
      val delTs =
        if (exists(spark, t))
          delete(spark, t, dels, idempotencyKey.map(_ + ":del"))
        else ""
      Seq(upTs, delTs).filter(_.nonEmpty)
    }
  }

  /** Predicate update — the Delta/Hudi SQL `UPDATE … SET … WHERE`
    * analog: rows matching `pred` are read through the stats-pruned
    * [[snapshotWhere]] discovery, the `set` expressions applied, and
    * the result upserted back (COW rewrite of only the affected
    * partitions; the rewritten rows carry the new commit ts, so
    * incremental readers observe the update as a change record).
    * Returns the commit ts, or "" when nothing matched.
    *
    * `set` must not modify record-key columns (that is an
    * insert-plus-orphan, not an update); changing PARTITION column
    * values moves rows between partitions and is only allowed on
    * GLOBAL-indexed tables (where upsert resolves old homes) — on
    * partition-scoped tables the old-partition copy would survive, so
    * the call is rejected.
    *
    * SQL semantics: every SET right-hand side is evaluated against the
    * PRE-UPDATE row (one projection — `SET a = b, b = a` swaps), never
    * against another clause's output, and clause order is immaterial.
    */
  def updateWhere(spark: SparkSession, t: KeyedTable, pred: Column,
      set: Map[String, Column]): String = {
    if (!exists(spark, t)) return ""
    require(set.keySet.intersect(t.recordKey.toSet).isEmpty,
      s"updateWhere must not modify record-key columns ${t.recordKey}")
    if (!t.globalIndex)
      require(set.keySet.intersect(t.partitionBy.toSet).isEmpty,
        "updateWhere cannot move rows between partitions on a " +
          s"partition-scoped table (partition columns ${t.partitionBy})")
    // a SET that LOWERS the precombine value would lose the merge to
    // the existing row — a published commit that silently applied
    // nothing. Updates need not touch it: at equal precombine the
    // newer _commit_ts wins, so the rewritten rows land regardless.
    require(!set.contains(t.precombineKey),
      s"updateWhere must not modify the precombine column " +
        s"'${t.precombineKey}' (merge ordering would be ambiguous)")
    val matched = snapshotWhere(spark, t, pred)
      .drop(KeyedTable.CommitCol)
    val unknown = set.keySet -- matched.columns
    require(unknown.isEmpty, s"updateWhere SET of unknown columns $unknown")
    // single projection: all RHS expressions see the original columns
    val updated = matched.select(matched.columns.toSeq.map(c =>
      set.get(c).map(_.as(c)).getOrElse(col(c))): _*)
    upsert(spark, t, updated)
  }

  /** Soft delete: upsert the matching rows back with `_deleted = true`.
    * Unlike [[delete]], the tombstone IS a row version — incremental
    * readers observe it as a normal change record (CDC-style), and a
    * later upsert of the same key resurrects it (an incoming batch
    * without the flag leaves `_deleted` null ⇒ active). Requires
    * nothing of the table schema: the flag column appears via the
    * upsert's additive schema evolution.
    */
  val DeletedCol = "_deleted"

  def softDelete(spark: SparkSession, t: KeyedTable, keys: DataFrame): String = {
    if (!exists(spark, t)) return ""
    val matched = snapshot(spark, t)
      .join(keys.select(t.recordKey.map(col): _*).distinct(),
        t.recordKey, "left_semi")
      .drop(KeyedTable.CommitCol)
      .withColumn(DeletedCol, lit(true))
    upsert(spark, t, matched)
  }

  /** Snapshot with soft-deleted rows filtered out (the read every
    * consumer except CDC wants).
    */
  def snapshotActive(spark: SparkSession, t: KeyedTable): DataFrame = {
    val snap = snapshot(spark, t)
    if (snap.columns.contains(DeletedCol))
      snap.filter(!coalesce(col(DeletedCol), lit(false)))
    else snap
  }

  /** Time-travel read — the table as of commit `asOf` (inclusive):
    * `spark.read.format("hudi").option("as.of.instant", ts)` analog.
    * With immutable commit dirs this is exact and trivial: resolve the
    * newest manifest ≤ asOf and read the dirs ITS map references.
    * Requires those commits to still be retained (see [[clean]]).
    */
  def snapshotAsOf(spark: SparkSession, t: KeyedTable, asOf: String): DataFrame =
    currentState(spark, t, Some(asOf)) match {
      case Some((parts, deltas)) =>
        val sch = schemaAt(spark, t, Some(asOf))
        val base = readParts(spark, t, parts, sch)
        if (deltas.isEmpty) base
        else Mor.mergedView(base, Mor.readDeltas(spark, t, deltas, sch), t)
      case None => throw new IllegalArgumentException(
        s"table ${t.name}: no commit at or before $asOf " +
          "(cleaned beyond retention, or before first commit)")
    }

  /** Restore the table to its state as of commit `asOf` — the Hudi
    * savepoint+restore / Delta RESTORE analog, expressed in the
    * manifest-pointer protocol as a PURE METADATA commit: the
    * historical state's partition→version map (and its live MOR delta
    * list, if any) is republished as the new latest manifest. No data
    * moves — the referenced dirs are immutable — so restore is
    * O(manifest) at any table size, and the restore is itself a
    * commit: time travel across it keeps working, and a later restore
    * can undo it.
    *
    * Every referenced dir is verified present BEFORE publishing (a
    * manifest pointing at cleaned dirs would brick every read), so
    * restore reaches exactly as far back as [[clean]] retention.
    *
    * Incremental/CDC readers: restored rows carry their HISTORICAL
    * `_commit_ts`, so a reader checkpointed past `asOf` observes no
    * new change records from the restore — re-seed downstream
    * consumers after restoring (Hudi's restore carries the same
    * stream-restart caveat).
    */
  def restoreTo(spark: SparkSession, t: KeyedTable, asOf: String): String = {
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    val (parts, deltas) = currentState(spark, t, Some(asOf)).getOrElse(
      throw new IllegalArgumentException(
        s"table ${t.name}: no commit at or before $asOf to restore to"))
    val sch = schemaAt(spark, t, Some(asOf))
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val needed = (parts.values ++ deltas).toSeq.distinct.sorted
    val roots = externalRoots(spark, t)
    val gone = needed.filterNot(v => fs.exists(new Path(verDir(t, roots, v))))
    require(gone.isEmpty,
      s"table ${t.name}: cannot restore to $asOf — commit dirs " +
        s"${gone.mkString(", ")} were cleaned beyond retention")
    // The KeyIndex (if any) will reflect a FUTURE state relative to the
    // restored one — and a staleness probe can be FOOLED: compactDeltas
    // compares syncedTs against lastBaseCommit (the newest delta-free
    // manifest), which after a restore-to-MOR-state can still name the
    // pre-restore compaction the index was stamped for, so the probe
    // would trust old-home lookups that post-date the restored state
    // and leave duplicate keys behind. Drop the stamp BEFORE the
    // manifest publishes: invalidate-then-crash costs one rebuild,
    // publish-then-crash-before-invalidate would re-arm the fooled
    // probe durably.
    if (t.globalIndex && KeyIndex.exists(spark, t))
      KeyIndex.invalidate(spark, t)
    val ts = CommitLog.newCommitTs()
    // Renames NEWER than the restore point are semantically UNDONE:
    // append their INVERSES to the lineage (newest-first, all at this
    // restore instant) so the restored old-name schema maps correctly
    // over files written during the undone era — without this, a
    // post-restore reader walking the stale forward entries would
    // resolve those files' renamed columns to the wrong physical name
    // (or a re-added name would collide). An orphan inverse entry from
    // a crash before the manifest publish is inert: its substitutions
    // are presence-conditional on names the un-restored schema does
    // not carry.
    log.renames().filter(_._1 > asOf).sortBy(_._1).reverse
      .foreach { case (_, o, n) => log.recordRename(ts, n, o) }
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "restore",
      "restored_to" -> asOf,
      PartsKey -> partsJson(parts)) ++
      (if (deltas.nonEmpty) Map(DeltasKey -> deltasJson(deltas)) else Map.empty) ++
      sch.map("schema" -> _.json),
      expectedPrev = Some(baseCommit))
    ts
  }

  /** `rows_written` manifest field for stats-carrying tables — folded
    * from the kilobyte sidecar the write just produced, never a count
    * job (the Hudi commit-metadata `numWrites` analog). Empty for
    * tables without sidecars.
    */
  private def rowsWrittenMeta(spark: SparkSession, t: KeyedTable,
      ts: String): Map[String, String] =
    if (t.statsColumns.isEmpty) Map.empty
    else ColumnStats.commitRows(spark, t, ts)
      .map(n => Map("rows_written" -> n.toString)).getOrElse(Map.empty)

  /** The commit timeline as a DataFrame — the Hudi CLI `commits show`
    * timeline-inspection analog: one row per RETAINED manifest with its
    * action, recorded `rows_written` (stats-carrying tables), live
    * MOR delta count, idempotency key, and an `archived = false` flag.
    * Driver-side kilobyte manifest reads — an ops/SQL surface, never a
    * data path (register with `.createOrReplaceTempView` to query the
    * timeline in SQL).
    *
    * `includeArchived = true` unions the ARCHIVED timeline (instants a
    * `clean(archive = true)` compacted out of the active timeline —
    * the Hudi `commits show archived` analog) as `archived = true`
    * rows, giving the full commit history in one ascending frame. An
    * instant caught mid-archival (crash between archive publish and
    * manifest delete) reports once, as active.
    */
  def timeline(spark: SparkSession, t: KeyedTable,
      includeArchived: Boolean = false): DataFrame = {
    import spark.implicits._
    val log = CommitLog(t, spark)
    def row(ts: String, m: Map[String, String], archived: Boolean) =
      (ts, m.getOrElse("action", "upsert"),
        m.get("rows_written").map(_.toLong),
        deltasOf(m).size, m.get("idempotency_key"), archived)
    val active = log.listCommits().map { ts =>
      row(ts, log.commitMeta(ts).getOrElse(Map.empty[String, String]),
        archived = false)
    }
    val activeTs = active.iterator.map(_._1).toSet
    val archived =
      if (!includeArchived) Nil
      else log.archivedMetas()
        .flatMap(m => m.get("commit_ts")
          .filterNot(activeTs).map(ts => row(ts, m, archived = true)))
    (archived ++ active).sortBy(_._1)
      .toDF("commit_ts", "action", "rows_written", "live_deltas",
        "idempotency_key", "archived")
  }

  /** Column-stats view — the Hudi metadata `col_stats` index / CLI
    * `stats show` analog next to [[filesView]]: one row per LIVE data
    * file with its exact row count and the tracked columns'
    * min/max/null-count triples from the stats sidecars, tagged
    * `commit_ts` + `role` (base/delta). This is the data the pruning
    * reads consume ([[graft.tables.ColumnStats.prunedRead]]), exposed
    * for humans and SQL: register as a temp view to audit clustering
    * quality (overlapping ranges = poor layout), find skewed files,
    * or explain why a predicate did/didn't skip. Driver-side
    * metadata work; empty frame (not an error) when no commit carries
    * a sidecar.
    */
  def statsView(spark: SparkSession, t: KeyedTable): DataFrame =
    currentState(spark, t, None) match {
      case Some((parts, deltas)) =>
        ColumnStats.statsView(spark, t, parts, deltas).getOrElse {
          import spark.implicits._
          Seq.empty[(String, Long, String, String)]
            .toDF("file", "rows", "commit_ts", "role")
        }
      case None => throw new IllegalArgumentException(
        s"table ${t.name} does not exist at ${t.path}")
    }

  /** Semantic NET diff between two instants — the version-compare
    * inspection surface next to [[timeline]] (what `changeLog` is to
    * every intermediate change, this is to the collapsed end-to-end
    * delta; Delta Lake users script the same thing over two
    * `VERSION AS OF` reads): one row per row-identity whose state
    * differs between `snapshotAsOf(from)` and `snapshotAsOf(to)`,
    * classified
    *
    *   - `insert`: identity absent at `from`, present at `to`;
    *   - `delete`: present at `from`, absent at `to` (hard deletes —
    *     a soft-delete tombstone flip is payload and reports as
    *     `update`; diff [[snapshotActive]] views for active-row
    *     semantics);
    *   - `update`: present in both with ANY payload column differing
    *     (null-safe, field-wise) — rows merely REWRITTEN between the
    *     instants (compaction, clustering, restore republish) do not
    *     report.
    *
    * Emitted payload columns are the `to`-side state, except deletes
    * which carry their last-visible `from`-side state. Schema
    * evolution between the instants is handled by null-backfilling
    * the missing columns on the older side (a widened column shows as
    * `update` only where the new value is non-null).
    *
    * Cost: both snapshots shuffle once on the row identity (one
    * full-outer join) — the honest price of a whole-table version
    * compare. At 100 TB scope it down: `pred` filters BOTH sides
    * before the join (partition/key predicates prune at the scan via
    * the stats sidecar like any `snapshotWhere`); restrict to
    * partition-stable predicates — a predicate on a column that
    * CHANGED between the instants would classify moved rows
    * asymmetrically.
    */
  def diff(spark: SparkSession, t: KeyedTable, from: String, to: String,
      pred: Option[Column] = None): DataFrame = {
    val idCols = t.rowIdentity
    def prep(instant: String): DataFrame = {
      val snap = snapshotAsOf(spark, t, instant)
      pred.map(snap.filter).getOrElse(snap)
    }
    val a = prep(from)
    val b = prep(to)
    val payloadCols = (a.columns ++ b.columns).distinct.toSeq
      .filterNot(c => idCols.contains(c) || c == "_commit_ts")
    def side(df: DataFrame, tag: String): DataFrame = {
      val have = df.columns.toSet
      val payload = struct(payloadCols.map(c =>
        (if (have(c)) col(c) else lit(null)).as(c)): _*)
      df.select(idCols.map(col) :+ payload.as(s"_p_$tag"): _*)
    }
    side(a, "a").join(side(b, "b"), idCols, "full_outer")
      .withColumn("change",
        when(col("_p_a").isNull, lit("insert"))
          .when(col("_p_b").isNull, lit("delete"))
          .when(!(col("_p_a") <=> col("_p_b")), lit("update")))
      .filter(col("change").isNotNull)
      .select(idCols.map(col) ++ (col("change") +:
        payloadCols.map(c =>
          when(col("change") === "delete", col(s"_p_a.$c"))
            .otherwise(col(s"_p_b.$c")).as(c))): _*)
  }

  /** File-system view — the Hudi CLI `show fsview all` analog next to
    * [[timeline]]'s `commits show`: one row per (partition rel × owning
    * BASE commit) from the current manifest, plus one row per live MOR
    * delta commit, each with parquet file count and bytes folded from
    * a recursive metadata listing. Driver-side kilobyte work (manifest
    * read + per-dir listings — the dir set is the partition count, not
    * the row count); register with `createOrReplaceTempView` to query
    * storage layout in SQL, feed retention/clustering decisions, or
    * gate small-file compaction ([[smallFilePartitions]] is the
    * decision-side sibling).
    */
  /** Read-only storage audit — the inspection sibling of [[clean]]
    * (Hudi CLI `cleans show` / orphan-file detection analog): every
    * commit-shaped dir under the data root (and its column-stats
    * sidecar root) that NO retained manifest references, classified
    *
    *   - `orphan`: the ts has no manifest at all — debris of a write
    *     that crashed after data landed but before the commit
    *     published (the dir was never visible to any reader);
    *   - `unreferenced`: the ts is in the timeline but no retained
    *     manifest resolves to it — history [[clean]] would collect.
    *
    * Same reachability rule AND same safety rail as the cleaner
    * (parts-map values ∪ live MOR deltas over ALL retained manifests;
    * if NO retained manifest carries a parts map, the dirs are not
    * ours to classify and the audit reports nothing — exactly the
    * case `clean` refuses to collect), so the dir-level report is
    * exactly the set a `clean` call may delete. Dead partition
    * SUBDIRS inside still-referenced commit dirs (clean's
    * partition-level GC) are not itemized here — this is the
    * commit-dir-granular view. Run it before/after retention changes
    * or after a crashed ingest to see what is reclaimable.
    * Driver-side metadata work only (dir listings).
    */
  def storageAudit(spark: SparkSession, t: KeyedTable): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val log = CommitLog(t, spark)
    val commitList = log.listCommits()
    val commits = commitList.toSet
    val metas = commitList.flatMap(ts => log.commitMeta(ts))
    val partsMaps = metas.flatMap(partsOf)
    if (partsMaps.isEmpty)
      return Seq.empty[(String, String, String, Long, Long)]
        .toDF("root", "commit_ts", "status", "parquet_files", "bytes")
    val referenced = partsMaps.flatMap(_.values).toSet ++
      metas.flatMap(deltasOf)
    def scan(root: Path, kind: String): Seq[(String, String, String, Long, Long)] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(st => CommitDirPattern.matches(st.getPath.getName))
        .filterNot(st => referenced.contains(st.getPath.getName))
        .map { st =>
          val ts = st.getPath.getName
          val status = if (commits.contains(ts)) "unreferenced" else "orphan"
          val it = fs.listFiles(st.getPath, true)
          var n = 0L
          var b = 0L
          while (it.hasNext) {
            val f = it.next()
            if (f.getPath.getName.endsWith(".parquet")) { n += 1; b += f.getLen }
          }
          (kind, ts, status, n, b)
        }
    (scan(new Path(t.dataPath), "data") ++
      scan(new Path(s"${t.commitsPath}/stats"), "stats"))
      .toDF("root", "commit_ts", "status", "parquet_files", "bytes")
  }

  def filesView(spark: SparkSession, t: KeyedTable): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    def stat(dir: Path): (Long, Long) =
      if (!fs.exists(dir)) (0L, 0L)
      else {
        val it = fs.listFiles(dir, true)
        var n = 0L
        var b = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) {
            n += 1; b += f.getLen
          }
        }
        (n, b)
      }
    val (parts, deltas) = currentState(spark, t, None)
      .getOrElse((Map.empty[String, String], Seq.empty[String]))
    val roots = externalRoots(spark, t)
    val baseRows = parts.toSeq.sortBy(_._1).map { case (rel, ver) =>
      val base = verDir(t, roots, ver)
      val dir = if (rel.isEmpty) new Path(base) else new Path(s"$base/$rel")
      val (n, b) = stat(dir)
      (rel, ver, "base", n, b)
    }
    val deltaRows = deltas.map { ts =>
      val (n, b) = stat(new Path(s"${t.dataPath}/$ts"))
      ("", ts, "delta", n, b)
    }
    (baseRows ++ deltaRows)
      .toDF("rel", "commit_ts", "role", "n_files", "bytes")
  }

  /** Pin the newest commit at or before `asOf` against retention — the
    * Hudi savepoint analog: [[clean]] keeps the pinned manifest (and
    * therefore every data dir it references) past the retention
    * window, so [[restoreTo]] that instant stays possible until
    * [[deleteSavepoint]]. Returns the pinned commit ts. Metadata-only:
    * one marker file.
    */
  def savepoint(spark: SparkSession, t: KeyedTable, asOf: String): String = {
    val log = CommitLog(t, spark)
    val ts = log.listCommits().filter(_ <= asOf).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"table ${t.name}: no commit at or before $asOf to savepoint"))
    log.savepoint(ts)
    ts
  }

  def deleteSavepoint(spark: SparkSession, t: KeyedTable,
      ts: String): Unit =
    CommitLog(t, spark).deleteSavepoint(ts)

  // ———————————————————————— replace commits (Hudi `replacecommit`) + CDC

  /** INSERT OVERWRITE (partition-scoped) — Hudi's `insert_overwrite`
    * write operation (another value of the same
    * `hoodie.datasource.write.operation` option the reference pins to
    * `upsert`, create_hudi_tables.py:124): REPLACE the partitions the
    * batch touches with exactly the batch's rows; every other
    * partition is untouched. Unlike [[upsert]] there is no merge
    * against existing rows, so a full-partition refresh costs O(batch)
    * no matter how large the partition currently is — the backfill
    * pattern (recompute a day, swap it in).
    *
    * Expressed the way Hudi expresses it (a `replacecommit`): the new
    * commit dir holds the batch and the new manifest points the
    * batch's partition rels at it; the replaced dirs become
    * unreferenced from those rels and age out via [[clean]]. Live MOR
    * deltas fold first ([[compactDeltas]]) — a delta row in a replaced
    * partition must not outlive the replacement.
    *
    * Not offered on partitioned `globalIndex` tables: the batch may
    * carry keys whose old homes live in partitions this operation
    * deliberately does not read or touch, which would break table-wide
    * key uniqueness — use [[insertOverwriteTable]] or [[upsert]] there
    * (Hudi's insert_overwrite bypasses the index the same way and
    * carries the same caveat). Unpartitioned tables replace the whole
    * table.
    */
  def insertOverwrite(
      spark: SparkSession,
      t: KeyedTable,
      rows: DataFrame,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      idempotencyKey: Option[String] = None): String = {
    require(!(t.globalIndex && t.partitionBy.nonEmpty),
      s"table ${t.name}: partition-scoped insertOverwrite would break " +
        "the GLOBAL key-uniqueness invariant (keys may have old homes " +
        "in untouched partitions) — use insertOverwriteTable or upsert")
    replaceCommit(spark, t, rows, sortBy, maxRecordsPerFile,
      idempotencyKey, wholeTable = false)
  }

  /** INSERT OVERWRITE TABLE — Hudi's `insert_overwrite_table`: replace
    * the WHOLE table with the batch in one `replacecommit`. The new
    * manifest references only the batch's partitions, and — unlike
    * every other write path — the recorded schema is the batch's own
    * (a full replacement genuinely drops columns the batch no longer
    * carries). The old state stays time-travel-readable until
    * [[clean]] retention passes it.
    */
  def insertOverwriteTable(
      spark: SparkSession,
      t: KeyedTable,
      rows: DataFrame,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      idempotencyKey: Option[String] = None): String =
    replaceCommit(spark, t, rows, sortBy, maxRecordsPerFile,
      idempotencyKey, wholeTable = true)

  private def replaceCommit(spark: SparkSession, t: KeyedTable,
      rows: DataFrame, sortBy: Seq[String], maxRecordsPerFile: Long,
      idempotencyKey: Option[String], wholeTable: Boolean): String =
    serviceGuard(spark, t)(replaceCommitUnlocked(spark, t, rows, sortBy,
      maxRecordsPerFile, idempotencyKey, wholeTable))

  private def replaceCommitUnlocked(spark: SparkSession, t: KeyedTable,
      rows: DataFrame, sortBy: Seq[String], maxRecordsPerFile: Long,
      idempotencyKey: Option[String], wholeTable: Boolean): String = {
    if (!exists(spark, t))
      return upsert(spark, t, rows, sortBy, maxRecordsPerFile,
        idempotencyKey)
    val log = CommitLog(t, spark)
    idempotencyKey.foreach { key =>
      if (log.hasIdempotencyKey(key)) return ""
    }
    if (rows.isEmpty) return ""
    if (liveDeltas(spark, t).nonEmpty) compactDeltas(spark, t)
    val baseCommit = log.latestCommit()
    val ts = CommitLog.newCommitTs()
    // Same within-batch identity discipline as upsert: the replaced
    // partitions must come out key-unique under the table's row
    // identity, newest precombine winning.
    val deduped = Upsert.dedupBatch(rows, t.rowIdentity,
      Seq(t.precombineKey))
    val stamped = deduped.withColumn(KeyedTable.CommitCol, lit(ts))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val dest = new Path(s"${t.dataPath}/$ts")
    val oldParts = currentParts(spark, t, None).getOrElse(Map.empty)
    // Partition-scoped overwrite keeps untouched partitions readable, so
    // the manifest schema stays the running union (same coercion as
    // deltaCommit — against an EMPTY manifest-schema frame, no dir
    // listing). Whole-table replacement records the batch schema as-is.
    val mergedSchema: StructType =
      if (wholeTable) stamped.schema
      else latestSchema(spark, t) match {
        case Some(s) => spark
          .createDataFrame(spark.sparkContext.emptyRDD[Row], s)
          .unionByName(stamped, allowMissingColumns = true).schema
        case None => stamped.schema
      }
    // retired-name tripwire BEFORE the write (partition-scoped
    // overwrites keep pre-rename commit dirs live under the merged
    // schema — a re-added retired name would collide in their mapped
    // reads; guarded on the whole-table path too for consistency)
    guardRetiredNames(log, t, schemaAt(spark, t, None), mergedSchema)
    writer(stamped, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
    val written = relsOf(fs, dest, t.partitionBy.length)
    val newParts: Map[String, String] =
      if (wholeTable || t.partitionBy.isEmpty) written.map(_ -> ts).toMap
      else oldParts ++ written.map(_ -> ts)
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, Some(mergedSchema))
    // A whole-table replacement invalidates every old-home the KeyIndex
    // knows — drop the stamp BEFORE the publish (same crash ordering as
    // restoreTo: invalidate-then-crash costs one rebuild, the reverse
    // would durably re-arm a wrong index).
    if (wholeTable && t.globalIndex && KeyIndex.exists(spark, t))
      KeyIndex.invalidate(spark, t)
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "replacecommit",
      "schema" -> mergedSchema.json,
      PartsKey -> partsJson(newParts)) ++
      idempotencyKey.map("idempotency_key" -> _) ++
      rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    idempotencyKey.foreach(log.recordIdempotencyKey)
    ts
  }

  /** DROP PARTITION — Hudi's `delete_partition` write operation: remove
    * whole partitions from the table as a PURE METADATA commit. `pred`
    * is evaluated over the table's partition VALUES (reference any
    * non-partition column and analysis fails — the natural guard), the
    * matching rels leave the partition→version map, and the new
    * manifest publishes; no data file is read or written at ANY table
    * size. The dropped dirs stay time-travel-readable until [[clean]]
    * retention passes them.
    *
    * Partition values are recovered from the map's hive-style rel paths
    * with Spark's own unescaping (the exact inverse of the writer's
    * escaping) and cast to the manifest schema's declared types, so the
    * predicate sees real typed columns, not strings.
    *
    * CDC caveat (same as Hudi's replacecommit family): rows removed by
    * a partition drop emit no per-row change records — [[changeLog]]
    * consumers must treat `delete_partition` commits as a re-seed
    * point, like a restore.
    */
  def deletePartitions(spark: SparkSession, t: KeyedTable,
      pred: Column): String = {
    require(t.partitionBy.nonEmpty,
      s"table ${t.name} is unpartitioned — nothing to drop " +
        "(deleteWhere/delete cover row-level deletes)")
    if (!exists(spark, t)) return ""
    if (liveDeltas(spark, t).nonEmpty) compactDeltas(spark, t)
    val log = CommitLog(t, spark)
    val baseCommit = log.latestCommit()
    val (parts, _) = currentState(spark, t, None).get
    val sch = latestSchema(spark, t)
    val doomed = matchingRels(spark, t, parts.keySet.toSeq.sorted, sch, pred)
    if (doomed.isEmpty) return ""
    // Dropped partitions take their keys' index entries with them —
    // same pre-publish invalidation ordering as restoreTo.
    if (t.globalIndex && KeyIndex.exists(spark, t))
      KeyIndex.invalidate(spark, t)
    val ts = CommitLog.newCommitTs()
    log.logCommit(ts, Map(
      "table" -> t.name,
      "action" -> "delete_partition",
      PartsKey -> partsJson(parts -- doomed)) ++
      sch.map("schema" -> _.json),
      expectedPrev = Some(baseCommit))
    ts
  }

  /** Rels whose partition values satisfy `pred`. Driver-side
    * metadata-sized work: one local row per partition rel, unescaped
    * with Spark's own path codec and cast to the declared partition
    * types before the predicate runs.
    */
  private def matchingRels(spark: SparkSession, t: KeyedTable,
      rels: Seq[String], sch: Option[StructType],
      pred: Column): Set[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val partCols = t.partitionBy
    val rows = rels.map { rel =>
      val segs = rel.split("/")
      require(segs.length == partCols.length,
        s"table ${t.name}: partition rel '$rel' does not match " +
          s"partition columns $partCols")
      val values = segs.zip(partCols).map { case (seg, c) =>
        val (name, eqVal) = seg.span(_ != '=')
        require(ExternalCatalogUtils.unescapePathName(name) == c,
          s"table ${t.name}: rel segment '$seg' is not under column $c")
        val raw = ExternalCatalogUtils.unescapePathName(
          eqVal.stripPrefix("="))
        if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
        else raw
      }
      Row.fromSeq(rel +: values.toSeq)
    }
    val strType = org.apache.spark.sql.types.StringType
    val schema = StructType(
      org.apache.spark.sql.types.StructField("__rel", strType) +:
        partCols.map(c =>
          org.apache.spark.sql.types.StructField(c, strType)))
    val typed = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .select(col("__rel") +: partCols.map { c =>
        sch.flatMap(_.fields.find(_.name == c))
          .map(f => col(c).cast(f.dataType).as(c))
          .getOrElse(col(c))
      }: _*)
    typed.filter(pred).select("__rel").collect()
      .map(_.getString(0)).toSet
  }

  /** Batch change-record read — the CDC counterpart of [[incremental]]
    * and the batch analog of the streaming
    * [[graft.streaming.IncrementalSource.changes]]: EVERY change
    * record published in (`beginExclusive`, `endInclusive`] — all
    * intermediate versions of a key, one row per written change, each
    * stamped with its own `_commit_ts` — where [[incremental]]
    * collapses the range to latest-wins. `_change_type` classifies
    * each record: `delete` for soft-delete tombstones
    * ([[softDelete]]'s `_deleted` flag), `upsert` otherwise (I-vs-U
    * disambiguation needs per-key history the write path deliberately
    * does not persist; consumers key-merge either way — Hudi's
    * `cdc.supplemental.logging=op_key_only` mode makes the same
    * trade).
    *
    * Same contracts as the streaming source: a commit's change records
    * are the rows stamped with ITS ts in ITS dir, so compaction /
    * restore / replace commits contribute only the rows they newly
    * wrote (a pure fold contributes nothing); records of commits
    * cleaned beyond retention no longer exist individually and the
    * commit is skipped; `delete_partition` removals emit nothing
    * (re-seed downstream, as with any compacted CDC log).
    *
    * COMPLETENESS GUARD: when the cleaner ran with `archive = true`,
    * a lagging consumer is detectable — if the ARCHIVED timeline holds
    * a change-bearing instant inside the requested range, this feed
    * has a hole (those records were merged into newer dirs and no
    * longer exist individually), and the read fails LOUD instead of
    * returning silently-partial changes: re-seed from a snapshot or
    * pass `allowIncomplete = true` for the surviving records only.
    * Unarchived cleans leave no evidence and keep the silent-skip
    * contract above — archival cleaning is what upgrades CDC laggards
    * from silent holes to a refusal (the Hudi analog: an incremental
    * query whose begin instant has aged into the archived timeline
    * errors rather than fabricating a partial feed).
    */
  def changeLog(
      spark: SparkSession,
      t: KeyedTable,
      beginExclusive: String,
      endInclusive: Option[String] = None,
      allowIncomplete: Boolean = false): DataFrame = {
    val log = CommitLog(t, spark)
    if (!allowIncomplete) {
      // still-active instants (archival crash window) have lost
      // nothing — only an archived instant whose manifest is GONE is
      // evidence of a cleaned-away change set. The ranged call prunes
      // non-overlapping archive batches by filename before opening any.
      val active = log.listCommits().toSet
      val lost = log.archivedMetas(
          range = Some((beginExclusive, endInclusive))).filter { m =>
        m.get("commit_ts").exists(ts => !active(ts)) &&
          !m.get("action").exists(CdcNonContributing)
      }
      if (lost.nonEmpty) throw new IllegalStateException(
        s"change feed for table ${t.name} over ($beginExclusive, " +
          s"${endInclusive.getOrElse("<latest>")}] is incomplete: " +
          s"${lost.size} change-bearing commit(s) in range were cleaned " +
          s"beyond retention (earliest lost: " +
          s"${lost.head.getOrElse("commit_ts", "?")}). Re-seed the " +
          "consumer from a snapshot, or pass allowIncomplete = true to " +
          "read only the surviving records")
    }
    val sch = latestSchema(spark, t).getOrElse(
      throw new IllegalStateException(
        s"table ${t.name} has no commit manifest — no change log"))
    val fs = new Path(t.dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots = externalRoots(spark, t)
    val rens = log.renames()
    val frames = log.listCommits()
      .filter(ts => ts > beginExclusive &&
        endInclusive.forall(ts <= _))
      .flatMap { ts =>
        // adopted (bootstrap) vers contribute ZERO change rows by
        // contract (no adopted row carries a commit stamp; bootstrap
        // is in CdcNonContributing) — skip outright rather than scan
        // the entire adopted corpus just to filter every row out
        if (roots.contains(ts)) None
        else {
          val dir = new Path(verDir(t, roots, ts))
          if (!fs.exists(dir)) None // metadata-only or cleaned commit
          else Some(
            readCommitDir(spark, Some(sch), rens, ts, dir.toString)
              .filter(col(KeyedTable.CommitCol) === lit(ts)))
        }
      }
    val unioned = frames.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch))
    val changeType =
      if (unioned.columns.contains(DeletedCol))
        when(coalesce(col(DeletedCol), lit(false)), lit("delete"))
          .otherwise(lit("upsert"))
      else lit("upsert")
    unioned.withColumn("_change_type", changeType)
  }

  /** Incremental read — records whose latest version was committed in
    * (`beginExclusive`, `endInclusive`] (S2; the reference's
    * `hoodie.datasource.query.type=incremental` +
    * `read.begin.instanttime`, incremental_etl_orders.py:217-227).
    *
    * A pushed-down string-range predicate on `_commit_ts`: `.explain`
    * shows it in PushedFilters, so parquet row-group stats (and the
    * commit-clustered file layout) skip untouched files — the Spark
    * analog of Hudi's timeline file-slice pruning. Tables carrying
    * column-stats sidecars (which always track `_commit_ts`) prune
    * untouched FILES from metadata before the scan even lists them —
    * at 100 TB the footer-open cost of a wide table dwarfs the
    * increment itself.
    */
  def incremental(
      spark: SparkSession,
      t: KeyedTable,
      beginExclusive: String,
      endInclusive: Option[String] = None): DataFrame = {
    val pred = endInclusive.foldLeft(
      col(KeyedTable.CommitCol) > lit(beginExclusive))(
      (p, e) => p && col(KeyedTable.CommitCol) <= lit(e))
    if (t.statsColumns.nonEmpty) snapshotWhere(spark, t, pred)
    else snapshot(spark, t).filter(pred)
  }

  /** Small-file compaction (reference: hoodie.parquet.small.file.limit
    * + clustering file sizing, create_hudi_tables.py:157-174): rewrite
    * the current snapshot into right-sized, optionally re-clustered
    * files as a fresh commit dir owning every partition. At scale, run
    * per partition on partitions whose file-count/size ratio degrades —
    * here table-wide for simplicity.
    */
  def compact(spark: SparkSession, t: KeyedTable,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      numFiles: Option[Int] = None,
      zorderBy: Seq[String] = Nil,
      hilbertBy: Seq[String] = Nil): String = {
    require(Seq(sortBy, zorderBy, hilbertBy).count(_.nonEmpty) <= 1,
      "pass ONE of sortBy (lexicographic), zorderBy, hilbertBy")
    val ts = CommitLog.newCommitTs()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val dest = new Path(s"${t.dataPath}/$ts")
    val indexWasFresh = indexFresh(spark, t)
    val baseCommit = CommitLog(t, spark).latestCommit()
    val snap = snapshot(spark, t)
    // z-order clustering (Delta OPTIMIZE ZORDER analog): files laid
    // out along the Morton curve of several columns, so column-stats
    // skipping works for predicates on ANY of them, not just a sort
    // prefix. numFiles feeds the z range-partitioning directly (a
    // repartition before it would just be re-shuffled away), and the
    // per-column ranges fold from the stats sidecars when available —
    // no extra data pass.
    def sidecarRanges(cols: Seq[String]) = currentParts(spark, t, None)
      .map(ColumnStats.columnRanges(spark, t, _, cols))
      .getOrElse(Map.empty)
    val clustered =
      if (zorderBy.nonEmpty)
        ZOrder.cluster(snap, zorderBy, numPartitions = numFiles,
          ranges = sidecarRanges(zorderBy))
      else if (hilbertBy.nonEmpty)
        // Hilbert layout (Hudi 0.10 hilbert curve mode): strictly
        // better locality than the Morton curve at the same bit
        // budget — consecutive curve positions are always neighbors
        Hilbert.cluster(snap, hilbertBy, numPartitions = numFiles,
          ranges = sidecarRanges(hilbertBy))
      else numFiles.fold(snap)(n => snap.repartition(n))
    writer(clustered, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
    val newParts = relsOf(fs, dest, t.partitionBy.length).map(_ -> ts).toMap
    val sch = latestSchema(spark, t)
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, sch)
    CommitLog(t, spark).logCommit(ts,
      Map("table" -> t.name, "action" -> "compact",
        PartsKey -> partsJson(newParts)) ++
        sch.map("schema" -> _.json) ++
        rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    // compaction moves files, not keys — the index stays valid for the
    // new commit, so re-stamp it, but ONLY if it was fresh for the
    // pre-compact commit (stamping a stale index would launder it past
    // the next writer's ensureFresh probe)
    if (indexWasFresh) KeyIndex.markSynced(spark, t, ts)
    ts
  }

  /** Was the key index in sync with the CURRENT latest commit? (false
    * when absent, not global, or stamped for an older commit)
    */
  private def indexFresh(spark: SparkSession, t: KeyedTable): Boolean =
    t.globalIndex && t.partitionBy.nonEmpty && KeyIndex.exists(spark, t) &&
      KeyIndex.syncedTs(spark, t).contains(
        CommitLog(t, spark).latestCommit().getOrElse(""))

  /** Catalog-sync analog of Hudi's hive sync (create_hudi_tables.py:
    * 130-138 — configured but DISABLED in every reference call, so a
    * session-catalog view is the faithful scope): (re)register the
    * table's current snapshot under a SQL-visible name. Like Hudi's
    * sync-after-commit, the registration captures THIS commit's
    * manifest — call again after writes so SQL sees the new state
    * (pipelines that re-load each run get this via [[graft.loaders
    * .Loaders.load]] instead).
    */
  def syncView(spark: SparkSession, t: KeyedTable,
      name: Option[String] = None): String = {
    val viewName = name.getOrElse(t.name)
    snapshot(spark, t).createOrReplaceTempView(viewName)
    viewName
  }

  /** Partition rels whose CURRENT dir holds more than `maxFiles` data
    * files — the small-file detection feeding [[compactPartitions]].
    * Driver-side FS listing of current dirs only (metadata-sized).
    */
  def smallFilePartitions(spark: SparkSession, t: KeyedTable,
      maxFiles: Int): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    partitionDirs(spark, t).collect {
      case (rel, dir)
          if fs.exists(new Path(dir)) &&
            fs.listStatus(new Path(dir))
              .count(st => st.isFile && !st.getPath.getName.startsWith("_")) > maxFiles =>
        rel
    }.toSeq.sorted
  }

  /** Partition-scoped compaction: rewrite ONLY the given partition rels
    * into a fresh commit dir (one write task — hence one file — per
    * partition, with `maxRecordsPerFile` splitting oversized ones;
    * optionally re-clustered via `sortBy`); every other partition keeps
    * its current dir untouched. This is the production compaction schedule
    * the table-wide [[compact]] scaladoc promises — pair it with
    * [[smallFilePartitions]]:
    *
    * {{{
    * TableOps.compactPartitions(spark, t,
    *   TableOps.smallFilePartitions(spark, t, maxFiles = 16))
    * }}}
    */
  def compactPartitions(spark: SparkSession, t: KeyedTable,
      rels: Seq[String],
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L): String = {
    require(t.partitionBy.nonEmpty, "compactPartitions needs a partitioned table")
    if (rels.isEmpty) return ""
    // fold live MOR deltas first: this rewrite republishes a manifest
    // WITHOUT a deltas list, so un-folded delta rows would silently
    // vanish from every subsequent read
    if (liveDeltas(spark, t).nonEmpty) compactDeltas(spark, t)
    val oldParts = currentParts(spark, t, None).getOrElse(return "")
    val target = oldParts.view.filterKeys(rels.contains).toMap
    if (target.isEmpty) return ""
    val ts = CommitLog.newCommitTs()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val dest = new Path(s"${t.dataPath}/$ts")
    val indexWasFresh = indexFresh(spark, t)
    val baseCommit = CommitLog(t, spark).latestCommit()
    val sch = latestSchema(spark, t)
    val subset = readParts(spark, t, target, sch)
    // hashing on the partition columns puts each partition's rows in
    // ONE write task → one file per partition, with maxRecordsPerFile
    // still splitting oversized partitions inside the task
    val coalesced =
      if (sortBy.nonEmpty) subset
      else subset.repartition(
        math.max(target.size, 1), t.partitionBy.map(col): _*)
    writer(coalesced, t, sortBy, maxRecordsPerFile).parquet(dest.toString)
    val written = relsOf(fs, dest, t.partitionBy.length)
    val newParts = oldParts -- target.keySet ++ written.map(_ -> ts)
    if (t.statsColumns.nonEmpty)
      ColumnStats.write(spark, t, ts, sch)
    CommitLog(t, spark).logCommit(ts,
      Map("table" -> t.name, "action" -> "compact",
        PartsKey -> partsJson(newParts)) ++
        sch.map("schema" -> _.json) ++
        rowsWrittenMeta(spark, t, ts),
      expectedPrev = Some(baseCommit))
    if (indexWasFresh) KeyIndex.markSynced(spark, t, ts)
    ts
  }

  /** Cleaner (reference: hoodie.cleaner KEEP_LATEST_FILE_VERSIONS +
    * retained commits, create_hudi_tables.py:141-148): drop commit
    * manifests beyond the retention window, then every commit data dir
    * no RETAINED manifest references (which also collects orphan dirs
    * from crashed writes). Time travel ([[snapshotAsOf]]) stays valid
    * for any instant ≥ the oldest retained commit. Single-writer: do
    * not run concurrently with a write.
    */
  /** `data/{17-digit-instant}` — the only dir shape this engine writes;
    * anything else under `data/` is foreign (externally-written parquet
    * the bare-dir snapshot fallback tolerates) and must never be
    * garbage-collected.
    */
  private[ops] val CommitDirPattern = "[0-9]{17}".r

  /** Minimum mtime age before [[clean]] GCs a `.tmp` scratch entry.
    * Live staging dirs are heartbeated ([[withScratch]]) so their mtime
    * never ages past this cutoff while the owning operation runs; an
    * orphan's heartbeat died with its owner, so it ages out.
    */
  private val TmpOrphanAgeMs = 60L * 60 * 1000

  /** Heartbeat period for live `.tmp` staging dirs — several beats fit
    * inside [[TmpOrphanAgeMs]], so one missed beat (GC pause, slow
    * store) cannot let a live dir age past the cutoff.
    */
  private val TmpHeartbeatMs: Long = TmpOrphanAgeMs / 6

  /** Liveness beacon file inside a scratch dir (see [[withScratch]]).
    * Dot-prefixed: Spark readers of the staged parquet ignore it.
    */
  private[ops] val HeartbeatFile = ".hb"

  /** Stage an operation's scratch dir under `.tmp` with a liveness
    * heartbeat: a daemon timer refreshes the dir's mtime every
    * `heartbeatMs` while `body` runs, so [[clean]]'s age-gated `.tmp`
    * GC can never collect a LIVE staging dir regardless of how long
    * the operation takes (a multi-hour GDPR rewrite included) — the
    * age gate alone would, since a dir's mtime is otherwise set at
    * creation and never touched again. The beat lands on TWO channels:
    * `setTimes` on the dir (cheap where supported) AND re-creation of
    * a dot-prefixed `.hb` file inside it — file creation stamps a
    * fresh mtime on EVERY store, so connectors that reject mtime
    * mutation still heartbeat ([[clean]] ages an entry by the max of
    * dir and `.hb` mtime; staged-parquet readers ignore dot files).
    * The dir is removed in `finally`.
    */
  private[graft] def withScratch[A](spark: SparkSession, t: KeyedTable,
      prefix: String, heartbeatMs: Long = TmpHeartbeatMs)(body: Path => A): A = {
    val tmp = new Path(t.path,
      s".tmp/$prefix-${java.util.UUID.randomUUID()}")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(tmp)
    val beat = new java.util.Timer(s"graft-tmp-heartbeat-$prefix", true)
    // cancel() does not wait for an in-flight task, and create() —
    // unlike setTimes — would RESURRECT a just-deleted dir (parent
    // mkdirs), leaving a zombie scratch entry; the stopped flag plus
    // exists probe shrinks that race to a TOCTOU sliver, and a zombie
    // that slips through ages out under clean()'s normal GC anyway
    val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
    beat.scheduleAtFixedRate(new java.util.TimerTask {
      def run(): Unit = {
        if (stopped.get) return
        try fs.setTimes(tmp, System.currentTimeMillis(), -1)
        catch { case _: Exception => () } // unsupported store / racing rewrite
        // file-creation heartbeat — fresh mtime on stores without
        // setTimes; an overwrite mid-beat (applyChanges re-staging the
        // dir) just loses one beat, the next recreates it
        try {
          if (!stopped.get && fs.exists(tmp))
            fs.create(new Path(tmp, HeartbeatFile), true).close()
        } catch { case _: Exception => () }
      }
    }, heartbeatMs, heartbeatMs)
    try body(tmp)
    finally {
      stopped.set(true)
      beat.cancel()
      fs.delete(tmp, true)
    }
  }

  /** Cleaner — drop aged commit manifests and GC every data dir no
    * retained manifest references (Hudi cleaner analog; reference
    * config create_hudi_tables.py:141-148). `archive = true` folds the
    * dropped manifests into the archived timeline first
    * ([[graft.tables.CommitLog.retain]]) — history survives as audit
    * metadata (`timeline(includeArchived = true)`) while the active
    * timeline and the data reclaim behave exactly as an unarchived
    * clean: archived instants are history-only and never extend
    * data-file lifetime.
    */
  /** `orphanGraceMs`: unreferenced commit-shaped dirs YOUNGER than
    * this are left alone. 0 (the default) keeps the manual-clean
    * contract — the caller owns serialization (the service guard locks
    * a manual clean beside a live service; otherwise single-writer
    * applies) and crash orphans collect immediately. The ASYNC service
    * passes a nonzero grace (the Delta-VACUUM-retention shape): a
    * writer that began BEFORE the service's marker published runs its
    * whole commit unguarded, and its staged dir is indistinguishable
    * from a crashed orphan until its manifest lands — age is the only
    * safe discriminator in that handoff window (review r15 finding).
    */
  def clean(spark: SparkSession, t: KeyedTable, retainCommits: Int,
      archive: Boolean = false, orphanGraceMs: Long = 0L): Seq[String] =
    serviceGuard(spark, t)(cleanUnlocked(spark, t, retainCommits, archive,
      orphanGraceMs))

  private def cleanUnlocked(spark: SparkSession, t: KeyedTable,
      retainCommits: Int, archive: Boolean,
      orphanGraceMs: Long): Seq[String] = {
    require(retainCommits >= 1, "retainCommits must be >= 1")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val log = CommitLog(t, spark)
    val dropped = log.retain(retainCommits, archive)
    val metas = log.listCommits().flatMap(ts => log.commitMeta(ts))
    val partsMaps = metas.flatMap(partsOf)
    // a commit dir is live if any retained manifest references it as a
    // partition owner OR as a MOR delta commit — a delta dir is data,
    // not history, until compaction folds it
    val referenced = partsMaps.flatMap(_.values).toSet ++
      metas.flatMap(deltasOf)
    val dataRoot = new Path(t.dataPath)
    // Two safety rails: (1) never collect anything unless at least one
    // retained manifest actually carries a parts map (a manifest-less
    // dir is NOT ours to delete); (2) only commit-shaped dirs are
    // candidates — foreign files/dirs are left alone.
    // One GC policy for both roots (commit data dirs and their
    // column-stats sidecars — the sidecar of an unreferenced commit is
    // as dead as its dir, including orphans from crashed writes).
    val graceFloor = System.currentTimeMillis() - orphanGraceMs
    def deleteUnreferenced(root: Path): Unit =
      if (partsMaps.nonEmpty && fs.exists(root))
        fs.listStatus(root)
          .filter(st => CommitDirPattern.matches(st.getPath.getName))
          .filter(st => !referenced.contains(st.getPath.getName))
          .filter(st => orphanGraceMs <= 0L ||
            st.getModificationTime < graceFloor)
          .foreach(st => fs.delete(st.getPath, true))
    deleteUnreferenced(dataRoot)
    deleteUnreferenced(new Path(s"${t.commitsPath}/stats"))
    // Partition-level GC inside LIVE commit dirs: a rel subdir is dead
    // once NO retained parts map maps (rel → this ver) — the
    // delete_partition / moved-ownership leftover case. Without this, a
    // dropped partition's bytes survive as long as ANY sibling rel
    // keeps the commit dir referenced (a retention /
    // right-to-be-forgotten gap: the whole point of dropping the
    // partition was for its data to age out). Time-travel-safe by the
    // same argument as dir-level GC: any retained manifest that can
    // resolve (rel → ver) keeps that subdir alive. MOR delta dirs are
    // exempt — every row of a delta is live regardless of the parts
    // map until compaction folds it.
    if (t.partitionBy.nonEmpty && partsMaps.nonEmpty) {
      // note the .toSeq: mapping a Map to swapped (ver, rel) tuples
      // would collapse same-ver entries to one surviving rel
      val liveRels = partsMaps
        .flatMap(_.toSeq.map { case (rel, ver) => (ver, rel) }).toSet
      val deltaSet = metas.flatMap(deltasOf).toSet
      (referenced -- deltaSet).foreach { ver =>
        val dir = new Path(s"${t.dataPath}/$ver")
        if (CommitDirPattern.matches(ver) && fs.exists(dir))
          relsOf(fs, dir, t.partitionBy.length)
            .filterNot(rel => liveRels((ver, rel)))
            .foreach(rel => fs.delete(new Path(dir, rel), true))
      }
    }
    // Legacy layout leftovers (pre-manifest-protocol tables) — but ONLY
    // once this table demonstrably speaks the manifest protocol: for a
    // table whose manifests carry no parts map (a round-1 layout), the
    // `.versions` dir IS its version archive — deleting it would destroy
    // time travel with no migration path. Warn and leave it instead.
    // Crash-orphaned scratch (deleteWhere key materializations,
    // applyChanges staging): normally removed in the operation's
    // finally block, so anything aged here is an orphan — a retention
    // concern for right-to-be-forgotten key sets. Age-gated (mtime >
    // 1h) rather than wholesale: clean() is a maintenance entry point
    // that operators run out-of-band, and deleting a LIVE in-flight
    // staging dir would corrupt that writer mid-operation. The age
    // gate is sound against arbitrarily long operations because live
    // dirs HEARTBEAT (withScratch refreshes mtime every 10 min) —
    // only on stores that reject setTimes does it degrade to a
    // creation-age gate, where a >1h single operation racing an
    // out-of-band clean() remains exposed (documented in withScratch).
    val tmpRoot = new Path(s"${t.path}/.tmp")
    if (fs.exists(tmpRoot)) {
      val cutoff = System.currentTimeMillis() - TmpOrphanAgeMs
      val entries = fs.listStatus(tmpRoot)
      // liveness = the NEWER of the entry's own mtime and its `.hb`
      // beacon's (withScratch's file-creation heartbeat — the channel
      // that works on stores rejecting setTimes)
      def lastBeat(st: org.apache.hadoop.fs.FileStatus): Long = {
        val own = st.getModificationTime
        if (!st.isDirectory) own
        else try {
          val hb = new Path(st.getPath, HeartbeatFile)
          if (fs.exists(hb))
            math.max(own, fs.getFileStatus(hb).getModificationTime)
          else own
        } catch { case _: Exception => own }
      }
      entries.filter(lastBeat(_) < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
      if (entries.isEmpty) fs.delete(tmpRoot, false)
    }
    if (partsMaps.nonEmpty) {
      fs.delete(new Path(s"${t.path}/.staging"), true)
      fs.delete(new Path(s"${t.path}/.versions"), true)
    } else if (log.listCommits().nonEmpty &&
        (fs.exists(new Path(s"${t.path}/.versions")) ||
          fs.exists(new Path(s"${t.path}/.staging")))) {
      System.err.println(
        s"graft: table ${t.name} has commit manifests but none carries a " +
          "parts map (pre-manifest legacy layout?) — leaving .versions/" +
          ".staging untouched; re-write the table (read + upsert into a " +
          "fresh path) to migrate before cleaning")
    }
    dropped
  }
}
