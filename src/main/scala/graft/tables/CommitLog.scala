package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.atomic.AtomicLong

/** Commit timeline for a [[KeyedTable]] — the engine's analog of the Hudi
  * timeline (reference: the `.hoodie/` instant files Hudi maintains under
  * every table path; queried indirectly via `_hoodie_commit_time` at
  * incremental_etl_orders.py:209-215).
  *
  * One tiny JSON manifest per commit at `path/.commits/{ts}.commit`.
  * Listing the timeline is an O(#commits) driver-side FS listing of
  * kilobyte files — never a data scan (the reference instead ran a
  * DISTINCT over the whole table + collect, an anti-pattern at scale;
  * SURVEY.md §4).
  */
final class CommitLog(table: KeyedTable, conf: Configuration) {
  private val dir = new Path(table.commitsPath)
  private def fs: FileSystem = dir.getFileSystem(conf)

  /** Commits in ascending (chronological == lexicographic) order. */
  def listCommits(): Seq[String] = {
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit"))
      .toSeq
      .sorted
  }

  def latestCommit(): Option[String] = listCommits().lastOption
  def earliestCommit(): Option[String] = listCommits().headOption

  /** Record a completed commit. `meta` is free-form (rows written, …);
    * values are JSON-escaped (the table schema rides in here).
    *
    * `expectedPrev` (Some(previous-latest-commit)) arms a best-effort
    * lost-update detector: the engine is single-writer per table, and a
    * second writer racing in would compute its state (parts map, merge
    * inputs) from a snapshot that omits the first writer's commit —
    * publishing would then silently HIDE that commit. Re-checking the
    * timeline just before the rename turns the common case of that
    * contract violation into a loud ConcurrentModificationException
    * (a small TOCTOU window remains — this is a tripwire, not a lock;
    * real multi-writer needs an external lock service, which the
    * reference also scopes out).
    */
  def logCommit(ts: String, meta: Map[String, String] = Map.empty,
      expectedPrev: Option[Option[String]] = None): Unit = {
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val payload = (meta + ("commit_ts" -> ts))
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    // The tripwire runs as the pre-publish hook — immediately before
    // the publishing rename, so the whole manifest write (a full PUT on
    // object stores) stays outside the undetected window.
    AtomicFile.write(fs, new Path(dir, s"$ts.commit"),
      payload.getBytes(StandardCharsets.UTF_8),
      beforePublish = () => expectedPrev.foreach { expected =>
        val actual = latestCommit()
        if (actual != expected)
          throw new java.util.ConcurrentModificationException(
            s"table ${table.name}: commit $ts was computed on top of " +
              s"${expected.getOrElse("<empty>")} but the timeline now ends " +
              s"at ${actual.getOrElse("<empty>")} — a concurrent writer " +
              "violated the single-writer contract; this commit is NOT " +
              "published")
      })
  }

  /** Meta of one commit (None if the manifest is gone or unparseable —
    * a truncated file from a legacy pre-rename writer must not brick
    * every subsequent read).
    */
  def commitMeta(ts: String): Option[Map[String, String]] = {
    val p = new Path(dir, s"$ts.commit")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    parseMeta(raw, p)
  }

  private def parseMeta(raw: String, p: Path,
      warnSkipped: Boolean = true): Option[Map[String, String]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try JsonMethods.parse(raw) match {
      case JObject(fields) =>
        Some(fields.collect { case (k, JString(v)) => k -> v }.toMap)
      case _ => Some(Map.empty)
    } catch {
      case _: Exception =>
        // callers that FAIL LOUD on None (externalRoots) suppress this
        // tolerant-path message — a "skipping" line immediately before
        // a refusing-to-read throw tells the operator the opposite of
        // what happened
        if (warnSkipped)
          System.err.println(s"graft: skipping unparseable commit manifest $p")
        None
    }
  }

  // ———————————————————————— external (bootstrap-adopted) data roots

  private def externalRootsFile = new Path(dir, "external_roots.json")

  /** ver → absolute source dir adopted IN PLACE by metadata-only
    * bootstrap ([[graft.ops.TableOps.bootstrap]]): the files of that
    * commit live at the recorded root, not under `data/{ver}`. Stored
    * OUTSIDE the manifests because it must survive timeline retention
    * — the adopted ver stays referenced by every later parts map long
    * after the bootstrap manifest itself ages out or archives. At most
    * one entry today (bootstrap must be the first commit); a map for
    * forward compatibility. Kilobyte read, absent for every
    * non-bootstrapped table (one `exists` probe).
    */
  def externalRoots(): Map[String, String] = {
    val p = externalRootsFile
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val raw =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    // fail LOUD on corruption: this file is load-bearing for resolving
    // the bootstrap ver — the tolerant manifest fallback would silently
    // degrade the adopted commit to "cleaned" in CDC/stream paths and
    // to a misleading path-not-found in snapshot reads
    parseMeta(raw, p, warnSkipped = false).getOrElse(
      throw new IllegalStateException(
        s"external-roots record $p exists but is unparseable — refusing " +
          "to read the table with its bootstrap resolution missing"))
  }

  /** Record an adopted root (atomic single-file publish; written
    * BEFORE the bootstrap manifest so a crash in between leaves an
    * unreferenced entry, never a published commit whose files cannot
    * be resolved).
    */
  def recordExternalRoot(ver: String, root: String): Unit = {
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    val payload = (externalRoots() + (ver -> root))
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    AtomicFile.write(fs, externalRootsFile,
      payload.getBytes(StandardCharsets.UTF_8))
  }

  // ———————————————— column-mapping records (rename / drop lineage)

  private def renamesFile = new Path(dir, "column_renames.json")

  /** Column-rename lineage, ascending by rename commit ts — the
    * engine's Delta/Hudi-1.0 column-mapping analog
    * ([[graft.ops.TableOps.renameColumn]]): each entry `(ts, old, new)`
    * says files of vers < ts store the column under its OLD physical
    * name. Readers walk this to map a manifest (logical) schema back
    * to each commit dir's physical names, so old files stay readable
    * across renames without a byte rewritten. Durable outside the
    * manifests for the same reason as [[externalRoots]]: pre-rename
    * vers stay referenced long after the rename manifest ages out.
    */
  def renames(): Seq[(String, String, String)] = {
    val p = renamesFile
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val raw =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    raw.linesIterator.flatMap { line =>
      line.split(CommitLog.RenameSep) match {
        case Array(ts, o, n) => Some((ts, o, n))
        case _ => None
      }
    }.toSeq.sortBy(_._1)
  }

  /** Append a rename record (atomic rewrite of the kilobyte lineage
    * file; written BEFORE the rename manifest publishes — an orphan
    * record is inert, because physical-name substitution only fires
    * when the read schema actually carries the NEW name).
    *
    * Concurrency: the read-modify-write here rides the engine's
    * single-writer-per-table contract, like every commit's state
    * computation. A contract-violating concurrent writer could lose a
    * record in the read/write window; [[graft.ops.TableOps
    * .renameColumn]] re-reads and asserts its entry immediately
    * before the manifest publishes (same best-effort-tripwire posture
    * as the manifest CAS — real multi-writer needs an external lock
    * service, out of scope here as in the reference).
    */
  def recordRename(ts: String, oldName: String, newName: String): Unit = {
    // control chars (esp. \n/\r) would split or corrupt the line-based
    // record — a silently-lost lineage entry is exactly the corruption
    // this file exists to prevent, so refuse loudly
    Seq(oldName, newName).foreach(n =>
      require(n.forall(_ >= ' '),
        s"column name contains control characters: ${n.map(c =>
          if (c < ' ') f"\\u${c.toInt}%04x" else c.toString).mkString}"))
    val payload = (renames() :+ ((ts, oldName, newName)))
      .map { case (t0, o, n) => s"$t0${CommitLog.RenameSep}$o${CommitLog.RenameSep}$n" }
      .mkString("\n")
    AtomicFile.write(fs, renamesFile,
      payload.getBytes(StandardCharsets.UTF_8))
  }

  private def droppedFile = new Path(dir, "dropped_columns.json")

  /** Names ever DROPPED from this table
    * ([[graft.ops.TableOps.dropColumn]]). Additive evolution must
    * refuse to re-add these: pre-drop files still hold the old
    * physical column under the same name, so a re-added column would
    * silently resurrect dropped values from them.
    */
  def droppedColumns(): Set[String] = {
    val p = droppedFile
    if (!fs.exists(p)) return Set.empty
    val in = fs.open(p)
    val raw =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    raw.linesIterator.filter(_.nonEmpty).toSet
  }

  def recordDropped(name: String): Unit = {
    require(name.forall(_ >= ' '),
      "column name contains control characters") // line-based record
    AtomicFile.write(fs, droppedFile,
      (droppedColumns() + name).toSeq.sorted.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
  }

  /** O(1) idempotency-key registry: one empty marker file per key under
    * `.commits/keys/`. Survives [[retain]] (the cleaner never touches
    * it), so exactly-once holds beyond the manifest retention window —
    * and an upsert's key probe is a single `exists()` instead of an
    * O(#commits) manifest scan per micro-batch.
    */
  private def keyPath(key: String): Path = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new Path(dir, s"keys/$h.key")
  }

  /** Marker probe, with a newest-to-oldest manifest scan as the
    * authoritative fallback: the marker is written AFTER the manifest
    * publishes (a key must never be recorded for a commit that is not
    * yet visible — that would turn a crash into silent batch loss), so
    * a crash in between leaves a published manifest whose marker is
    * missing. Consulting only the NEWEST manifest is not enough: a
    * maintenance commit (compact/clean/delete — none of which carry
    * this key) can land between the crashed keyed commit and the batch
    * replay, pushing the keyed manifest off the head of the timeline —
    * the replay would then re-apply the batch, silently breaking
    * exactly-once. The scan walks newest→oldest and stops at the first
    * keyed manifest whose OWN marker exists: under the single-writer
    * model markers complete in commit order, so every keyed commit
    * older than a marker-complete one has its marker too — the probe
    * key, had it ever committed there, would have hit the fast path.
    * That bounds the FAST scan to O(crash window) manifests (normally
    * 1–2). A found key is backfilled into the marker registry so
    * subsequent probes are O(1) again.
    *
    * A fast-scan miss alone is not authoritative, because an
    * out-of-order sink can land a fresh keyed commit (marker complete)
    * ON TOP of a crashed one whose marker was lost. The scan therefore
    * does not early-exit on another key's marker at all; instead it is
    * bounded by a SEALED WATERMARK (`keys/_sealed`, holding a commit
    * ts W): the invariant is that every keyed commit with ts ≤ W has
    * its marker in the registry, so the registry miss that brought us
    * here is authoritative for everything at or below W, and the scan
    * only reads manifests ABOVE it. While walking, the scan BACKFILLS
    * the missing marker of every keyed commit it passes (any such hole
    * is a crash window — the manifest is published, so recording its
    * marker is exactly the completion the crash lost), and when the
    * walk reaches the old seal without finding the probe key it
    * advances W to the newest commit. Steady state: each probe reads
    * only the manifests landed since the previous probe (normally
    * 1–2) — in particular a FRESH key, the dominant case for a
    * streaming sink minting a new batch key per micro-batch, never
    * pays an O(#retained) scan (only the very first probe of a
    * pre-seal timeline does, once). The backfill also repairs the
    * out-of-order case structurally: by the time any later batch
    * probes, every crashed commit below it has been healed into the
    * O(1) registry.
    *
    * Exactly-once therefore holds for any interleaving of keyed and
    * unkeyed commits within the retention window. Remaining
    * assumptions, both documented: (1) manifests for keyed commits are
    * not [[retain]]-dropped before their markers exist — true for any
    * real retention setting; (2) commit timestamps are monotonic
    * ([[CommitLog.newCommitTs]]'s single-writer contract) — the same
    * assumption the timeline's ordering itself rests on (a commit
    * minted BELOW the seal after the seal was written would be
    * invisible to every probe, but it would equally corrupt
    * incremental reads and retention).
    */
  def hasIdempotencyKey(key: String): Boolean =
    fs.exists(keyPath(key)) || scanForKey(key)

  private def sealedPath = new Path(dir, "keys/_sealed")

  private def sealedTs: Option[String] =
    if (!fs.exists(sealedPath)) None
    else {
      val in = fs.open(sealedPath)
      val raw =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim
        finally in.close()
      Option(raw).filter(_.nonEmpty)
    }

  private def writeSealed(ts: String): Unit = {
    fs.mkdirs(sealedPath.getParent)
    val out = fs.create(sealedPath, true)
    try out.write(ts.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def scanForKey(key: String): Boolean = {
    val all = listCommits()
    val seal = sealedTs
    var found = false
    val it = all.reverseIterator
    while (it.hasNext && !found) {
      val ts = it.next()
      if (seal.exists(ts <= _)) {
        // registry authoritative at and below the seal; the probe
        // already missed it, and everything above is now verified —
        // advance the seal so the next probe stops even earlier
        if (all.nonEmpty) writeSealed(all.last)
        return false
      }
      commitMeta(ts).flatMap(_.get("idempotency_key")).foreach { k =>
        if (!fs.exists(keyPath(k))) recordIdempotencyKey(k) // heal crash window
        if (k == key) found = true
      }
    }
    // walked the whole retained timeline: every keyed commit now has a
    // marker, so the registry is complete through the newest commit
    if (!found && all.nonEmpty) writeSealed(all.last)
    found
  }

  def recordIdempotencyKey(key: String): Unit = {
    val p = keyPath(key)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Parsed metadata of every commit manifest (ascending commit order).
    * Driver-side read of kilobyte files — used for idempotency-key
    * lookups, never on a data path.
    */
  def commitMetas(): Seq[Map[String, String]] =
    listCommits().flatMap(commitMeta)

  // ————————————————————————————————————————————————————— savepoints

  /** Savepoint markers (`savepoints/{ts}.savepoint`) pin a commit
    * against retention — the Hudi savepoint analog backing guaranteed
    * [[graft.ops.TableOps.restoreTo]]: [[retain]] never drops a
    * savepointed manifest, and the cleaner keeps every data dir a
    * retained manifest references, so the pinned state stays fully
    * restorable until [[deleteSavepoint]].
    */
  private def savepointPath(ts: String) =
    new Path(dir, s"savepoints/$ts.savepoint")

  def savepoint(ts: String): Unit = {
    require(fs.exists(new Path(dir, s"$ts.commit")),
      s"table ${table.name}: cannot savepoint $ts — no such commit " +
        "manifest (already cleaned, or never existed)")
    val p = savepointPath(ts)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  def deleteSavepoint(ts: String): Unit =
    fs.delete(savepointPath(ts), false): Unit

  def savepoints(): Seq[String] = {
    val root = new Path(dir, "savepoints")
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".savepoint")).map(_.stripSuffix(".savepoint"))
      .toSeq.sorted
  }

  /** Drop the oldest commit manifests, keeping `keep` (cleaner support —
    * reference: hoodie.cleaner KEEP_LATEST_FILE_VERSIONS,
    * create_hudi_tables.py:141-148). Savepointed manifests are never
    * dropped — the retained timeline may therefore carry holes, which
    * every reader already tolerates (state resolution walks
    * newest→oldest over whatever manifests exist).
    *
    * `archive = true` compacts the dropped manifests into the archived
    * timeline ([[archiveManifests]]) before deleting them — the Hudi
    * timeline-archival analog: commit HISTORY survives retention as
    * audit metadata while the ACTIVE timeline (what every reader lists
    * per operation) stays O(keep). Archived instants are history-only:
    * state resolution, time travel, and the cleaner's reachability rule
    * all consult only the active timeline, so archiving never extends
    * data-file lifetime.
    */
  def retain(keep: Int, archive: Boolean = false): Seq[String] = {
    val all = listCommits()
    val pinned = savepoints().toSet
    val drop = all.dropRight(keep).filterNot(pinned)
    if (archive) archiveManifests(drop)
    drop.foreach(ts => fs.delete(new Path(dir, s"$ts.commit"), false))
    drop
  }

  // ————————————————————————————————————————————— archived timeline

  private def archiveDir = new Path(dir, "archived")

  /** Compact the given manifests into ONE archive batch file
    * (`archived/{first}_{last}.archive`, JSON-lines of the full
    * manifest payloads) — the Hudi archived-timeline analog (Hudi
    * folds aged instants into compacted log batches under
    * `.hoodie/archived/` so the active timeline stays small without
    * destroying history). One batch per archival run keeps the archive
    * itself O(#runs) files, not O(#commits): listing cost never
    * regrows what retention just reclaimed.
    *
    * Crash-safety: the batch publishes atomically BEFORE any manifest
    * is deleted (the caller deletes after), so a crash in between
    * leaves a commit both active and archived — readers dedup by
    * `commit_ts` with the active side winning, and the retry archival
    * re-writes the same content, so nothing is lost or doubled.
    */
  def archiveManifests(drop: Seq[String]): Unit = {
    val archived = drop.flatMap { ts =>
      val p = new Path(dir, s"$ts.commit")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val raw =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8)
          finally in.close()
        // manifests are single-line JSON by construction (logCommit
        // escapes control chars); normalize defensively anyway so one
        // legacy multi-line payload cannot corrupt the whole batch
        Some(ts -> raw.replace('\n', ' ').replace('\r', ' '))
      }
    }
    if (archived.isEmpty) return
    val lines = archived.map(_._2)
    // name the batch by the range it actually HOLDS (skipped
    // already-gone manifests excluded) — a filename advertising a
    // wider range than its content makes ranged guard probes open
    // batches with nothing in-window
    val batch = new Path(archiveDir,
      s"${archived.head._1}_${archived.last._1}.archive")
    AtomicFile.write(fs, batch,
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    foldArchiveBatches()
  }

  /** Size-tiered fold of archive batch files (binary-counter merge):
    * whenever the two SMALLEST batches sit in the same size tier
    * (smaller·2 > larger), they merge into one spanning batch. Under
    * per-commit cleaning — the live-writer retention discipline, where
    * every archival run drops exactly one manifest — this keeps the
    * archive at O(log n) files with amortized O(log n) rewrites per
    * instant (total bytes rewritten ≈ archive size · log n, kilobytes
    * here), instead of the O(#commits) file count that would quietly
    * regrow the listing cost retention just reclaimed. Crash between
    * the merged write and the input deletes leaves duplicate instants
    * across batches — the read side dedups by commit_ts, and the next
    * fold retries.
    */
  private def foldArchiveBatches(): Unit = {
    def nameRange(p: Path): (String, String) = {
      val n = p.getName.stripSuffix(".archive")
      val i = n.indexOf('_')
      if (i < 0) (n, n) else (n.substring(0, i), n.substring(i + 1))
    }
    var merged = true
    while (merged) {
      merged = false
      val batches = fs.listStatus(archiveDir)
        .filter(_.getPath.getName.endsWith(".archive"))
        .sortBy(_.getLen)
      if (batches.length >= 2 &&
          batches(0).getLen * 2 > batches(1).getLen) {
        val (a, b) = (batches(0).getPath, batches(1).getPath)
        def readAll(p: Path): String = {
          val in = fs.open(p)
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8)
          finally in.close()
        }
        val (aF, aL) = nameRange(a); val (bF, bL) = nameRange(b)
        val first = if (aF <= bF) aF else bF
        val last = if (aL >= bL) aL else bL
        val target = new Path(archiveDir, s"${first}_$last.archive")
        AtomicFile.write(fs, target,
          (readAll(a).trim + "\n" + readAll(b).trim)
            .getBytes(StandardCharsets.UTF_8))
        // compare by NAME: listStatus paths are scheme-qualified
        // (file:/…) while target is not, so Path equality would pass
        // a name-colliding input through and delete the just-merged
        // target
        Seq(a, b).filter(_.getName != target.getName)
          .foreach(p => fs.delete(p, false))
        merged = true
      }
    }
  }

  /** Parsed metadata of ARCHIVED commits, ascending commit order.
    * Crash-retry duplicates (the same instant in two batches, or in a
    * batch and still active) collapse to one row — first batch wins;
    * rows without a `commit_ts` (unparseable legacy debris) are
    * skipped. Driver-side kilobyte reads, O(log #archival runs) files
    * after [[foldArchiveBatches]].
    *
    * `range = Some((beginExclusive, endInclusiveOpt))` returns only
    * instants in that window AND prunes non-overlapping batch files by
    * their `{first}_{last}` filename before opening any — the CDC
    * completeness guards run this per micro-batch, so a guard probe
    * over a fresh range must not pay the whole archive.
    */
  def archivedMetas(range: Option[(String, Option[String])] = None)
      : Seq[Map[String, String]] = {
    if (!fs.exists(archiveDir)) return Nil
    val all = fs.listStatus(archiveDir).iterator
      .map(_.getPath)
      .filter(_.getName.endsWith(".archive"))
      .toSeq.sortBy(_.getName)
    val batches = range.fold(all) { case (begin, endOpt) =>
      all.filter { p =>
        val n = p.getName.stripSuffix(".archive")
        val i = n.indexOf('_')
        val (first, last) =
          if (i < 0) (n, n) else (n.substring(0, i), n.substring(i + 1))
        last > begin && endOpt.forall(first <= _)
      }
    }
    val inRange: String => Boolean = ts => range.forall {
      case (begin, endOpt) => ts > begin && endOpt.forall(ts <= _)
    }
    val metas = batches.flatMap { p =>
      val in = fs.open(p)
      val raw =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      raw.split('\n').iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap(line => parseMeta(line, p)).toSeq
    }
    val seen = scala.collection.mutable.HashSet.empty[String]
    metas.flatMap { m =>
      m.get("commit_ts") match {
        case Some(ts) if inRange(ts) && seen.add(ts) => Some(ts -> m)
        case _ => None
      }
    }.sortBy(_._1).map(_._2)
  }
}

object CommitLog {
  /** Field separator of the column-rename lineage file — a control
    * char no sane column name contains (and [[CommitLog.recordRename]]
    * rejects ones that do).
    */
  private[tables] val RenameSep = "\u0001"

  private val fmt =
    DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS").withZone(ZoneOffset.UTC)
  private val last = new AtomicLong(0L)

  /** New monotonic commit timestamp (Hudi instant format). Monotonicity
    * is guaranteed within this JVM even under clock ties — the engine is
    * single-writer per table (SURVEY.md §2k: OCC is out of scope, as the
    * reference only enables it for metadata indexing).
    */
  def newCommitTs(): String = {
    val now = System.currentTimeMillis()
    val ts = last.updateAndGet(prev => math.max(prev + 1, now))
    fmt.format(Instant.ofEpochMilli(ts))
  }

  def apply(table: KeyedTable, spark: SparkSession): CommitLog =
    new CommitLog(table, spark.sparkContext.hadoopConfiguration)
}
