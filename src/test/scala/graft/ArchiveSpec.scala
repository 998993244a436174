package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Timeline archival ([[CommitLog.retain]] `archive = true`,
  * [[TableOps.timeline]] `includeArchived`) and the inline-compaction
  * policy ([[TableOps.deltaCommit]] `inlineCompactAfter`) — the two
  * Hudi table-service behaviors layered on the cleaner: history must
  * survive retention as metadata without extending data lifetime, and
  * the compaction policy must bound write amplification without
  * changing visibility.
  */
class ArchiveSpec extends SparkSuite {
  import spark.implicits._

  private def table(prefix: String) = {
    val base = tmpDir(prefix)
    KeyedTable("t", s"$base/t", Seq("id"), "ver",
      statsColumns = Seq("ver"))
  }

  private def rows(rs: (String, Int)*) = rs.toDF("id", "ver")

  private def fullTimeline(t: KeyedTable) =
    TableOps.timeline(spark, t, includeArchived = true)
      .select("commit_ts", "action", "rows_written", "live_deltas",
        "archived")
      .as[(String, String, Option[Long], Int, Boolean)]
      .collect().toSeq

  test("archival clean: history survives retention, data GC unchanged") {
    val t = table("graft-arch")
    TableOps.upsert(spark, t, rows(("a", 1), ("b", 1), ("c", 1)))
    TableOps.deltaCommit(spark, t, rows(("b", 2)))
    TableOps.compactDeltas(spark, t)
    val before = fullTimeline(t)
    assert(before.map(r => (r._2, r._3, r._4, r._5)) === Seq(
      ("upsert", Some(3L), 0, false),
      ("deltacommit", Some(1L), 1, false),
      ("compact", Some(3L), 0, false)))

    val dropped = TableOps.clean(spark, t, retainCommits = 1,
      archive = true)
    assert(dropped.size === 2)
    val log = CommitLog(t, spark)
    // active timeline shrank; archived carries the dropped metas
    assert(log.listCommits().size === 1)
    assert(log.archivedMetas().map(_("commit_ts")) === dropped)
    // the FULL history is byte-identical modulo the archived flag
    val after = fullTimeline(t)
    assert(after.map(r => (r._1, r._2, r._3, r._4)) ===
      before.map(r => (r._1, r._2, r._3, r._4)))
    assert(after.map(_._5) === Seq(true, true, false))
    // history-only: the dropped commits' data dirs were reclaimed
    // exactly as an unarchived clean would (archive extends nothing)
    val fs = new Path(t.dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDirs = fs.listStatus(new Path(t.dataPath))
      .map(_.getPath.getName).toSet
    assert(liveDirs === Set(after.last._1))
    // ... and the snapshot still reads
    assert(TableOps.snapshot(spark, t).count() === 3)
  }

  test("savepointed commit is neither dropped nor archived") {
    val t = table("graft-arch-sp")
    val c1 = TableOps.upsert(spark, t, rows(("a", 1)))
    val c2 = TableOps.upsert(spark, t, rows(("a", 2)))
    TableOps.upsert(spark, t, rows(("a", 3)))
    TableOps.savepoint(spark, t, c1)
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    val log = CommitLog(t, spark)
    assert(log.listCommits().head === c1) // pinned, still active
    assert(log.archivedMetas().map(_("commit_ts")) === Seq(c2))
  }

  test("repeated archival runs: no duplicate instants, folded batch files") {
    val t = table("graft-arch-rep")
    (1 to 5).foreach(v => TableOps.upsert(spark, t, rows(("a", v))))
    TableOps.clean(spark, t, retainCommits = 3, archive = true)
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    val log = CommitLog(t, spark)
    assert(log.archivedMetas().size === 4)
    assert(log.archivedMetas().map(_("commit_ts")).distinct.size === 4)
    val tl = fullTimeline(t)
    assert(tl.size === 5)
    assert(tl.map(_._5) === Seq(true, true, true, true, false))
    // the size-tiered fold keeps the file count at or below the run
    // count (similar-sized batches merge)
    val fs = new Path(t.commitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = fs.listStatus(new Path(s"${t.commitsPath}/archived"))
      .map(_.getPath.getName).filter(_.endsWith(".archive"))
    assert(batches.length <= 2)
  }

  test("per-commit archival cleaning keeps the archive at O(log n) files") {
    val t = table("graft-arch-fold")
    TableOps.upsert(spark, t, rows(("a", 0)))
    // the live-writer discipline: one archival clean per commit, each
    // run dropping exactly one manifest — the worst case for file-count
    // growth (one batch per run unfolded)
    (1 to 24).foreach { v =>
      TableOps.upsert(spark, t, rows(("a", v)))
      TableOps.clean(spark, t, retainCommits = 1, archive = true)
    }
    val log = CommitLog(t, spark)
    assert(log.archivedMetas().size === 24) // nothing lost to folding
    assert(log.archivedMetas().map(_("commit_ts")).distinct.size === 24)
    val fs = new Path(t.commitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = fs.listStatus(new Path(s"${t.commitsPath}/archived"))
      .map(_.getPath.getName).filter(_.endsWith(".archive"))
    assert(batches.length <= 7, // ~log2(24) + slack, NOT 24
      s"archive must fold: ${batches.length} files for 24 runs")
    // ranged read: filename pruning + instant filter agree with the
    // full read restricted to the window
    val all = log.archivedMetas().map(_("commit_ts"))
    val lo = all(5); val hi = all(10)
    assert(log.archivedMetas(range = Some((lo, Some(hi))))
      .map(_("commit_ts")) === all.filter(ts => ts > lo && ts <= hi))
    assert(log.archivedMetas(range = Some((all.last, None))) === Nil)
  }

  test("lagging secondary index rebuilds instead of throwing after archival clean") {
    import graft.tables.SecondaryIndex
    val t = table("graft-arch-idx")
    val payload = Seq(("a", 1, "x"), ("b", 1, "y"))
      .toDF("id", "ver", "v")
    TableOps.upsert(spark, t, payload)
    SecondaryIndex.refresh(spark, t, "v") // synced at commit 1
    TableOps.upsert(spark, t, Seq(("a", 2, "z")).toDF("id", "ver", "v"))
    TableOps.upsert(spark, t, Seq(("b", 2, "w")).toDF("id", "ver", "v"))
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    // the index is synced BELOW the archived horizon: the increment is
    // unrecoverable, so maintenance must fall back to a rebuild — not
    // propagate the changeLog completeness guard
    SecondaryIndex.applyIncrement(spark, t, "v")
    val hits = SecondaryIndex.lookup(spark, t, "v",
        Seq("z", "w").toDF("v"))
      .select("id").as[String].collect().toSet
    assert(hits === Set("a", "b"))
  }

  test("SCD2 build reads surviving records on an archival-cleaned table") {
    val t = table("graft-arch-scd2")
    (1 to 3).foreach(v =>
      TableOps.upsert(spark, t, rows(("a", v))))
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    // contract: the dimension's horizon IS the retention horizon — the
    // guard must not refuse the documented surviving-records read
    val dim = graft.ops.Scd2.build(spark, t, trackCols = Seq("ver"))
    assert(dim.count() > 0)
  }

  test("crash window: instant both archived and active reports once, as active") {
    val t = table("graft-arch-crash")
    val c1 = TableOps.upsert(spark, t, rows(("a", 1)))
    TableOps.upsert(spark, t, rows(("a", 2)))
    val log = CommitLog(t, spark)
    // simulate the crash between archive publish and manifest delete
    log.archiveManifests(Seq(c1))
    assert(log.listCommits().size === 2) // manifest still active
    val tl = fullTimeline(t)
    assert(tl.size === 2)
    assert(tl.map(_._5) === Seq(false, false)) // active side wins
    // the retry archival converges: same content, still one instant
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    assert(fullTimeline(t).map(_._5) === Seq(true, false))
  }

  test("default clean leaves no archive; includeArchived=false unchanged") {
    val t = table("graft-arch-off")
    TableOps.upsert(spark, t, rows(("a", 1)))
    TableOps.upsert(spark, t, rows(("a", 2)))
    TableOps.clean(spark, t, retainCommits = 1)
    val log = CommitLog(t, spark)
    assert(log.archivedMetas() === Nil)
    assert(TableOps.timeline(spark, t).count() === 1)
  }

  test("inline compaction fires at the threshold, not below") {
    val t = table("graft-ic")
    TableOps.upsert(spark, t, rows(("a", 1), ("b", 1)))
    TableOps.deltaCommit(spark, t, rows(("a", 2)),
      inlineCompactAfter = Some(3))
    TableOps.deltaCommit(spark, t, rows(("b", 2)),
      inlineCompactAfter = Some(3))
    // 2 live deltas < 3 — no compaction yet
    assert(TableOps.timeline(spark, t)
      .filter(col("action") === "compact").count() === 0)
    TableOps.deltaCommit(spark, t, rows(("a", 3)),
      inlineCompactAfter = Some(3))
    val tl = TableOps.timeline(spark, t)
      .select("action", "live_deltas")
      .as[(String, Int)].collect().toSeq
    assert(tl === Seq(("upsert", 0), ("deltacommit", 1),
      ("deltacommit", 2), ("deltacommit", 3), ("compact", 0)))
    // visibility identical to the unmanaged-merge result
    assert(TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet ===
      Set(("a", 3), ("b", 2)))
  }

  test("CDC completeness guard: archived change-bearing commits fail loud") {
    val t = table("graft-cdc-guard")
    TableOps.upsert(spark, t, rows(("a", 1)))
    val c2 = TableOps.upsert(spark, t, rows(("a", 2)))
    TableOps.upsert(spark, t, rows(("a", 3)))
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    // a bootstrap-range read would fabricate a partial feed — refuse
    val ex = intercept[IllegalStateException] {
      TableOps.changeLog(spark, t, beginExclusive = "")
    }
    assert(ex.getMessage.contains("incomplete"))
    // surviving records only, on explicit request
    assert(TableOps.changeLog(spark, t, "", allowIncomplete = true)
      .select("ver").as[Int].collect().toSeq === Seq(3))
    // a range past the retention horizon is complete — no guard trip
    assert(TableOps.changeLog(spark, t, beginExclusive = c2)
      .select("ver").as[Int].collect().toSeq === Seq(3))
  }

  test("archived non-contributing commits (compact) do not trip the CDC guard") {
    val t = table("graft-cdc-nc")
    TableOps.upsert(spark, t, rows(("a", 1)))
    TableOps.deltaCommit(spark, t, rows(("a", 2)))
    TableOps.compactDeltas(spark, t)
    TableOps.upsert(spark, t, rows(("a", 3)))
    val log = CommitLog(t, spark)
    val fs = new Path(t.commitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def archiveAndDrop(action: String): Unit = {
      val ts = TableOps.timeline(spark, t)
        .filter(col("action") === action)
        .select("commit_ts").as[String].head()
      log.archiveManifests(Seq(ts))
      fs.delete(new Path(s"${t.commitsPath}/$ts.commit"), false): Unit
    }
    // crash window first: archived but still ACTIVE instants have lost
    // nothing — the guard must not trip
    log.archiveManifests(log.listCommits())
    assert(TableOps.changeLog(spark, t, "").count() === 3)
    // a LOST compaction is a pure fold — the feed is still complete
    archiveAndDrop("compact")
    assert(TableOps.changeLog(spark, t, "")
      .select("ver").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    // a LOST delta commit is a hole — refuse
    archiveAndDrop("deltacommit")
    intercept[IllegalStateException] {
      TableOps.changeLog(spark, t, "")
    }
  }

  test("archived hard delete does not trip the CDC guard (CDC-invisible live too)") {
    val t = table("graft-cdc-del")
    TableOps.upsert(spark, t, rows(("a", 1), ("b", 1)))
    TableOps.upsert(spark, t, rows(("a", 2)))
    TableOps.delete(spark, t, Seq("b").toDF("id"))
    // the hard delete contributes nothing to the feed even while live
    // (survivors keep their old stamps; removals are invisible — the
    // tombstone-visible path is softDelete)
    assert(TableOps.changeLog(spark, t, "")
      .select("ver").as[Int].collect().sorted.toSeq === Seq(1, 1, 2))
    val log = CommitLog(t, spark)
    val fs = new Path(t.commitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delTs = TableOps.timeline(spark, t)
      .filter(col("action") === "delete")
      .select("commit_ts").as[String].head()
    log.archiveManifests(Seq(delTs))
    fs.delete(new Path(s"${t.commitsPath}/$delTs.commit"), false): Unit
    // losing it to the archive therefore loses nothing — no guard trip
    assert(TableOps.changeLog(spark, t, "")
      .select("ver").as[Int].collect().sorted.toSeq === Seq(1, 1, 2))
  }

  test("archived bootstrap does not trip the CDC guard (NULL stamps live too)") {
    val base = tmpDir("graft-cdc-bs")
    rows(("a", 1), ("b", 1)).write.parquet(s"$base/src")
    val t = KeyedTable("cdcbs", s"$base/t", Seq("id"), "ver")
    val bsTs = TableOps.bootstrap(spark, t, s"$base/src")
    TableOps.upsert(spark, t, rows(("a", 2)))
    // the bootstrap contributes nothing to the feed even while live
    assert(TableOps.changeLog(spark, t, "")
      .select("ver").as[Int].collect().toSeq === Seq(2))
    val log = CommitLog(t, spark)
    val fs = new Path(t.commitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    log.archiveManifests(Seq(bsTs))
    fs.delete(new Path(s"${t.commitsPath}/$bsTs.commit"), false): Unit
    // losing it to the archive therefore loses nothing — no guard trip
    assert(TableOps.changeLog(spark, t, "")
      .select("ver").as[Int].collect().toSeq === Seq(2))
  }

  test("streaming guard tolerates an archived hard delete like the batch guard") {
    val t = table("graft-cdc-sdel")
    TableOps.upsert(spark, t, rows(("a", 1), ("b", 1)))
    TableOps.upsert(spark, t, rows(("a", 2)))
    TableOps.delete(spark, t, Seq("b").toDF("id"))
    val log = CommitLog(t, spark)
    val fs = new Path(t.commitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delTs = TableOps.timeline(spark, t)
      .filter(col("action") === "delete")
      .select("commit_ts").as[String].head()
    log.archiveManifests(Seq(delTs))
    fs.delete(new Path(s"${t.commitsPath}/$delTs.commit"), false): Unit
    val q = graft.streaming.IncrementalSource.changes(spark, t)
      .writeStream.format("memory").queryName("cdcsdel")
      .option("checkpointLocation", tmpDir("graft-cdc-sdel-chk"))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("cdcsdel")
      .select("ver").as[Int].collect().sorted.toSeq === Seq(1, 1, 2))
  }

  test("streaming CDC restart over an archived gap fails loud; option opts out") {
    val t = table("graft-cdc-stream")
    TableOps.upsert(spark, t, rows(("a", 1)))
    TableOps.upsert(spark, t, rows(("a", 2)))
    TableOps.upsert(spark, t, rows(("a", 3)))
    TableOps.clean(spark, t, retainCommits = 1, archive = true)
    val q1 = graft.streaming.IncrementalSource.changes(spark, t)
      .writeStream.format("memory").queryName("cdcguard1")
      .option("checkpointLocation", tmpDir("graft-cdc-chk1"))
      .start()
    val ex = intercept[Exception] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(ex.toString.contains("incomplete") ||
      Option(ex.getCause).exists(_.toString.contains("incomplete")))
    val q2 = graft.streaming.IncrementalSource.changes(spark, t,
        Map("allowIncompleteFeed" -> "true"))
      .writeStream.format("memory").queryName("cdcguard2")
      .option("checkpointLocation", tmpDir("graft-cdc-chk2"))
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("cdcguard2")
      .select("ver").as[Int].collect().toSeq === Seq(3))
  }

  test("live streaming sink: per-batch archival clean bounds the active timeline") {
    // the driver query's own gates (active=1, archived=2, all three
    // batch keys replay, full history=3) run in-query; here pin the
    // DATA contract at sf0.001 — cleaning under a live writer must
    // lose nothing
    val out = graft.queries.OpsQueries
      .streamSinkRetentionReplay(spark, sfDir)
    val expected = graft.queries.CoreQueries.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    assert(out.count() === expected.count())
    assert(out.exceptAll(expected).isEmpty &&
      expected.exceptAll(out).isEmpty)
  }

  test("streaming top-k equals the batch top-10 with deterministic tie-break") {
    val out = graft.queries.OpsQueries.streamTopkReplay(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val batch = graft.queries.CoreQueries.events(spark, sfDir)
      .select(when(col("user_id") % 2 === 0,
        concat(lit("hot_"), col("event_type")))
        .otherwise(concat(lit("u"), col("user_id"), lit("_"),
          col("event_type"))).as("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item")).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(out === batch)
    assert(out.size === 10)
  }

  test("inline policy is per-run: compaction resets the counter") {
    val t = table("graft-ic-run")
    TableOps.upsert(spark, t, rows(("a", 1)))
    (2 to 5).foreach { v =>
      TableOps.deltaCommit(spark, t, rows(("a", v)),
        inlineCompactAfter = Some(2))
    }
    val actions = TableOps.timeline(spark, t)
      .select("action").as[String].collect().toSeq
    // every second delta folds: d,d,compact,d,d,compact
    assert(actions === Seq("upsert", "deltacommit", "deltacommit",
      "compact", "deltacommit", "deltacommit", "compact"))
    assert(TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].head() === ("a", 5))
  }
}
