package graft

import graft.ops.{Mor, TableOps, Upsert}
import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.functions._

/** MERGE_ON_READ table state: delta commits, real-time merged view,
  * compaction equivalence, cleaner safety, COW-path fold-first guards.
  */
class MorSpec extends SparkSuite {
  import spark.implicits._

  private def table(partitioned: Boolean, stats: Seq[String] = Nil) = {
    val base = tmpDir("graft-mor")
    KeyedTable("m", s"$base/m", Seq("id"), "ver",
      if (partitioned) Seq("part") else Nil, statsColumns = stats)
  }

  private def rows(rs: (String, Int, String, String)*) =
    rs.toDF("id", "ver", "payload", "part")

  private def visible(t: KeyedTable) =
    TableOps.snapshot(spark, t).select("id", "ver", "payload", "part")
      .as[(String, Int, String, String)].collect().toSet

  test("delta commit merges in the real-time view; base untouched") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    val baseDirs = TableOps.partitionDirs(spark, t)
    val ts = TableOps.deltaCommit(spark, t,
      rows(("b", 2, "y2", "p2"), ("c", 1, "z", "p1")))
    assert(ts.nonEmpty)
    // base partition map unchanged — the delta wrote no base rewrite
    assert(TableOps.partitionDirs(spark, t) === baseDirs)
    assert(visible(t) === Set(
      ("a", 1, "x", "p1"), ("b", 2, "y2", "p2"), ("c", 1, "z", "p1")))
  }

  test("precombine discipline matches COW: stale delta loses, ties to newer commit") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 5, "base", "p1")))
    // lower precombine: the base row must win the merge
    TableOps.deltaCommit(spark, t, rows(("a", 3, "stale", "p1")))
    assert(visible(t) === Set(("a", 5, "base", "p1")))
    // equal precombine: newer commit (the delta) wins — COW tie order
    TableOps.deltaCommit(spark, t, rows(("a", 5, "tie", "p1")))
    assert(visible(t) === Set(("a", 5, "tie", "p1")))
  }

  test("multiple deltas resolve among themselves by commit order") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "v0", "p1")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "v1", "p1")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "v2", "p1")))
    TableOps.deltaCommit(spark, t, rows(("d", 1, "new", "p1")))
    assert(visible(t) === Set(("a", 2, "v2", "p1"), ("d", 1, "new", "p1")))
  }

  test("compactDeltas folds to identical visible rows, clears deltas, rewrites only touched partitions") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p3")))
    val dirsBefore = TableOps.partitionDirs(spark, t)
    TableOps.deltaCommit(spark, t,
      rows(("a", 2, "x2", "p1"), ("n", 1, "new", "p4")))
    val before = visible(t)
    val ts = TableOps.compactDeltas(spark, t)
    assert(ts.nonEmpty)
    assert(visible(t) === before)
    // pure-COW again: no deltas in the manifest, second fold is a no-op
    assert(TableOps.compactDeltas(spark, t) === "")
    val dirsAfter = TableOps.partitionDirs(spark, t)
    // untouched partitions keep their original commit dirs
    assert(dirsAfter("part=p2") === dirsBefore("part=p2"))
    assert(dirsAfter("part=p3") === dirsBefore("part=p3"))
    // touched + new partitions moved to the compaction commit
    assert(dirsAfter("part=p1").endsWith(s"$ts/part=p1"))
    assert(dirsAfter("part=p4").endsWith(s"$ts/part=p4"))
  }

  test("real-time view equals the COW table fed the same batches") {
    val t = table(partitioned = true)
    val cow = KeyedTable("c", s"${tmpDir("graft-mor-cow")}/c",
      Seq("id"), "ver", Seq("part"))
    val b0 = rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"))
    val b1 = rows(("a", 2, "x2", "p1"), ("c", 1, "z", "p2"))
    val b2 = rows(("b", 1, "tie", "p2"), ("d", 4, "w", "p3"))
    TableOps.upsert(spark, t, b0); TableOps.upsert(spark, cow, b0)
    TableOps.deltaCommit(spark, t, b1); TableOps.upsert(spark, cow, b1)
    TableOps.deltaCommit(spark, t, b2); TableOps.upsert(spark, cow, b2)
    def proj(tt: KeyedTable) =
      TableOps.snapshot(spark, tt).select("id", "ver", "payload", "part")
        .as[(String, Int, String, String)].collect().toSet
    assert(proj(t) === proj(cow))
    TableOps.compactDeltas(spark, t)
    assert(proj(t) === proj(cow))
  }

  test("clean() never collects delta dirs referenced by retained manifests") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val d1 = TableOps.deltaCommit(spark, t, rows(("b", 1, "y", "p1")))
    val d2 = TableOps.deltaCommit(spark, t, rows(("c", 1, "z", "p1")))
    TableOps.clean(spark, t, retainCommits = 3)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${t.dataPath}/$d1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${t.dataPath}/$d2")))
    assert(visible(t) === Set(
      ("a", 1, "x", "p1"), ("b", 1, "y", "p1"), ("c", 1, "z", "p1")))
    // after compaction + retention past the delta manifests, they fold away
    TableOps.compactDeltas(spark, t)
    TableOps.clean(spark, t, retainCommits = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t.dataPath}/$d1")))
    assert(visible(t) === Set(
      ("a", 1, "x", "p1"), ("b", 1, "y", "p1"), ("c", 1, "z", "p1")))
  }

  test("COW entry points fold live deltas first and stay correct") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "x2", "p1")))
    // upsert on MOR state: folds, then merges the new batch
    TableOps.upsert(spark, t, rows(("b", 2, "y2", "p2")))
    assert(visible(t) === Set(("a", 2, "x2", "p1"), ("b", 2, "y2", "p2")))
    val log = CommitLog(t, spark)
    assert(log.commitMeta(log.latestCommit().get).get
      .get("deltas").forall(_ == "[]"))
    // delete on MOR state
    TableOps.deltaCommit(spark, t, rows(("c", 1, "z", "p1")))
    TableOps.delete(spark, t, Seq("a").toDF("id"))
    assert(visible(t) === Set(("b", 2, "y2", "p2"), ("c", 1, "z", "p1")))
  }

  test("snapshotWhere on MOR state merges before filtering") {
    val t = table(partitioned = false, stats = Seq("ver"))
    TableOps.upsert(spark, t, rows(("a", 9, "base-wins", "p1")))
    // superseded delta row matches the predicate; the winning base row
    // does not — a filter-before-merge would resurrect the loser
    TableOps.deltaCommit(spark, t, rows(("a", 2, "loser", "p1")))
    val got = TableOps.snapshotWhere(spark, t, col("ver") < 5)
    assert(got.count() === 0)
    assert(TableOps.snapshotWhere(spark, t, col("ver") > 5)
      .select("payload").as[String].collect().toSeq === Seq("base-wins"))
    // countFast must not answer from base-file stats while deltas live
    TableOps.deltaCommit(spark, t, rows(("b", 1, "n", "p1")))
    assert(TableOps.countFast(spark, t) === 2)
  }

  test("incremental read sees delta commits; time travel honors delta instants") {
    val t = table(partitioned = false)
    val t0 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val d1 = TableOps.deltaCommit(spark, t, rows(("a", 2, "x2", "p1")))
    val d2 = TableOps.deltaCommit(spark, t, rows(("b", 1, "y", "p1")))
    val inc = TableOps.incremental(spark, t, beginExclusive = t0)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(inc === Set(("a", 2), ("b", 1)))
    val asOf = TableOps.snapshotAsOf(spark, t, d1)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(asOf === Set(("a", 2)))
    assert(TableOps.snapshotAsOf(spark, t, d2).count() === 2)
    // read-optimized view is the base only
    assert(TableOps.snapshotReadOptimized(spark, t)
      .select("ver").as[Int].collect().toSeq === Seq(1))
  }

  test("GLOBAL MOR: delta moves a key between partitions; fold kills the old copy") {
    val g = KeyedTable("g", s"${tmpDir("graft-mor-g")}/g", Seq("id"), "ver",
      Seq("part"), globalIndex = true)
    TableOps.upsert(spark, g, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    // key a moves p1 → p3 via the delta path
    TableOps.deltaCommit(spark, g, rows(("a", 2, "x2", "p3")))
    // real-time view: table-wide key uniqueness holds pre-compaction
    assert(visible(g) === Set(("a", 2, "x2", "p3"), ("b", 1, "y", "p2")))
    TableOps.compactDeltas(spark, g)
    assert(visible(g) === Set(("a", 2, "x2", "p3"), ("b", 1, "y", "p2")))
    // the old home was rewritten; emptied p1 left the parts map
    val dirs = TableOps.partitionDirs(spark, g)
    assert(!dirs.contains("part=p1") && dirs.contains("part=p3"))
    // untouched partition kept its dir through the global fold
    assert(dirs.contains("part=p2"))
    // the index recorded the move: a follow-up COW upsert that trusts
    // it for old-home discovery preserves uniqueness on another move
    TableOps.upsert(spark, g, rows(("a", 3, "x3", "p2")))
    assert(visible(g) === Set(("a", 3, "x3", "p2"), ("b", 1, "y", "p2")))
  }

  test("GLOBAL MOR: stale-delta key keeps its base home through the fold") {
    val g = KeyedTable("g2", s"${tmpDir("graft-mor-g2")}/g2", Seq("id"), "ver",
      Seq("part"), globalIndex = true)
    TableOps.upsert(spark, g, rows(("a", 5, "keep", "p1")))
    // lower-precombine delta targeting another partition must LOSE —
    // the key stays in p1 with the base payload
    TableOps.deltaCommit(spark, g, rows(("a", 2, "late", "p9")))
    assert(visible(g) === Set(("a", 5, "keep", "p1")))
    TableOps.compactDeltas(spark, g)
    assert(visible(g) === Set(("a", 5, "keep", "p1")))
    val dirs = TableOps.partitionDirs(spark, g)
    assert(dirs.contains("part=p1") && !dirs.contains("part=p9"))
  }

  test("delta commit contracts: replay skip, empty batch, fresh-table delegate") {
    val t = table(partitioned = false)
    // fresh table: delegates to a COW first commit
    val ts0 = TableOps.deltaCommit(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b0"))
    assert(ts0.nonEmpty)
    assert(CommitLog(t, spark).commitMeta(ts0).get.get("deltas").isEmpty)
    // replayed key: skipped
    assert(TableOps.deltaCommit(spark, t, rows(("z", 1, "no", "p1")),
      idempotencyKey = Some("b0")) === "")
    // empty batch: no commit
    assert(TableOps.deltaCommit(spark, t,
      rows(("q", 1, "q", "p1")).filter(lit(false))) === "")
    assert(visible(t) === Set(("a", 1, "x", "p1")))
  }

  test("MOR snapshotWhere skips base files disjoint from the delta key range") {
    val base = tmpDir("graft-mor-skip")
    val t0 = KeyedTable("sk", s"$base/sk", Seq("id"), "ver",
      statsColumns = Seq("id"))
    val rows0 = spark.range(1, 201)
      .selectExpr("id", "1 as ver", "concat('p', id) as payload")
    // key-clustered write → per-file id ranges are disjoint
    val ts1 = TableOps.upsert(spark, t0, rows0, sortBy = Seq("id"),
      maxRecordsPerFile = 60)
    TableOps.deltaCommit(spark, t0,
      Seq((150L, 2, "upd")).toDF("id", "ver", "payload"))
    // correctness first: split read ≡ full merged view, several shapes
    val full = TableOps.snapshot(spark, t0)
    for (p <- Seq(col("id") <= 100, col("id") >= 101,
        col("id") > 140 && col("id") < 160, col("payload") === "upd")) {
      val got = TableOps.snapshotWhere(spark, t0, p)
        .select("id", "ver", "payload").as[(Long, Int, String)]
        .collect().toSet
      val want = full.filter(p)
        .select("id", "ver", "payload").as[(Long, Int, String)]
        .collect().toSet
      assert(got === want, s"pred $p")
    }
    // pruning: files range-disjoint from the delta key AND excluded by
    // the predicate are not read — file skipping is live under MOR
    val stats = spark.read.parquet(s"${t0.path}/.commits/stats/$ts1")
      .select("file", "max_id").as[(String, Long)].collect()
    assert(stats.length >= 3) // clustered write produced several files
    val lowNames = stats.filter(_._2 < 101)
      .map(f => new java.net.URI(f._1).getPath.split('/').last)
    assert(lowNames.nonEmpty)
    val hiRead = TableOps.snapshotWhere(spark, t0, col("id") >= 101)
    assert(!hiRead.inputFiles.exists(f => lowNames.exists(f.endsWith)),
      "low-range safe files must be pruned from a high-range read")
    // sanity: the same safe files ARE read when the predicate wants them
    val loRead = TableOps.snapshotWhere(spark, t0, col("id") <= 100)
    assert(lowNames.forall(n => loRead.inputFiles.exists(_.endsWith(n))))

    // partitioned variant: partition columns survive the split read
    val tp = KeyedTable("skp", s"$base/skp", Seq("id"), "ver",
      Seq("part"), statsColumns = Seq("id"))
    TableOps.upsert(spark, tp, spark.range(1, 101).selectExpr("id",
      "1 as ver", "if(id % 2 = 0, 'even', 'odd') as part"),
      sortBy = Seq("id"))
    TableOps.deltaCommit(spark, tp,
      Seq((50L, 2, "even")).toDF("id", "ver", "part"))
    val gotP = TableOps.snapshotWhere(spark, tp, col("id") >= 40)
      .select("id", "ver", "part").as[(Long, Int, String)].collect().toSet
    val wantP = TableOps.snapshot(spark, tp).filter(col("id") >= 40)
      .select("id", "ver", "part").as[(Long, Int, String)].collect().toSet
    assert(gotP === wantP)
    assert(gotP.contains((50L, 2, "even")) && gotP.size === 61)
  }

  test("streaming MOR ingest: per-batch delta commits + inline compaction") {
    val base = tmpDir("graft-mor-stream")
    val srcDir = s"$base/src"
    val target = KeyedTable("ms", s"$base/ms", Seq("id"), "ver")
    // 4 source files → 4 micro-batches at maxFilesPerTrigger=1;
    // distinct keys per file so every batch commits
    (0 until 4).foreach { i =>
      Seq((s"k$i", 1, s"v$i", "p1")).toDF("id", "ver", "payload", "part")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    val q = graft.streaming.StreamingEtl.parquetToTableMor(
      spark, srcDir, schema, target, s"$base/ckpt",
      compactEvery = 2, maxFilesPerTrigger = Some(1))
    q.awaitTermination(60000)
    assert(visible(target).map(r => (r._1, r._2)) ===
      (0 until 4).map(i => (s"k$i", 1)).toSet)
    // inline compaction kept the live-delta backlog under the trigger
    assert(TableOps.liveDeltaCommits(spark, target).size < 2)
    val log = CommitLog(target, spark)
    val actions = log.listCommits()
      .flatMap(ts => log.commitMeta(ts).flatMap(_.get("action")))
    // at least one delta commit and at least one inline compaction ran
    assert(actions.contains("deltacommit") && actions.contains("compact"))
  }

  test("delta commits stream as CDC change records; compaction emits nothing") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.deltaCommit(spark, t, rows(("b", 1, "y", "p1")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "x2", "p1")))
    // fold: carried-over rows keep their historical _commit_ts, so the
    // compaction commit must contribute NO change records
    TableOps.compactDeltas(spark, t)
    val q = graft.streaming.IncrementalSource.changes(spark, t)
      .writeStream.format("memory").queryName("morcdc")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("morcdc").select("id", "ver")
      .as[(String, Int)].collect().toSeq.sorted
    // one record per logical change across base + both deltas — no
    // duplicates from the fold
    assert(got === Seq(("a", 1), ("a", 2), ("b", 1)))
  }

  test("timeline surfaces actions, rows_written, and live delta counts") {
    val base = tmpDir("graft-mor-tl")
    val t = KeyedTable("tl", s"$base/tl", Seq("id"), "ver",
      statsColumns = Seq("ver"))
    TableOps.upsert(spark, t,
      Seq((1L, 1), (2L, 1), (3L, 1)).toDF("id", "ver"))
    TableOps.deltaCommit(spark, t, Seq((2L, 2)).toDF("id", "ver"),
      idempotencyKey = Some("d1"))
    TableOps.compactDeltas(spark, t)
    val tl = TableOps.timeline(spark, t)
      .select("action", "rows_written", "live_deltas", "idempotency_key")
      .as[(String, Option[Long], Int, Option[String])].collect().toSeq
    assert(tl === Seq(
      ("upsert", Some(3L), 0, None),
      ("deltacommit", Some(1L), 1, Some("d1")),
      ("compact", Some(3L), 0, None)))
    // SQL-visible ops surface
    TableOps.timeline(spark, t).createOrReplaceTempView("tl_commits")
    assert(spark.sql(
      "SELECT sum(rows_written) FROM tl_commits WHERE action = 'compact'")
      .head().getLong(0) === 3L)
  }

  test("crashed delta write: orphan dir invisible to reads, collected by clean") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    // a deltaCommit that died after writing data but BEFORE publishing
    // its manifest leaves exactly this: a commit-shaped dir nothing
    // references
    val orphan = "20990101000000000"
    rows(("z", 9, "ghost", "p1"))
      .write.parquet(s"${t.dataPath}/$orphan")
    assert(visible(t) === Set(("a", 1, "x", "p1")),
      "an unpublished delta dir must be structurally invisible")
    TableOps.clean(spark, t, retainCommits = 5)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"${t.dataPath}/$orphan")),
      "clean must collect a crashed delta write's orphan dir")
    assert(visible(t) === Set(("a", 1, "x", "p1")))
  }

  test("restoreTo republishes a historical state as a metadata commit") {
    val t = table(partitioned = true)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1"), ("b", 1, "y", "p2")))
    TableOps.delete(spark, t, Seq("a").toDF("id"))
    assert(visible(t) === Set(("b", 1, "y", "p2")))
    val rts = TableOps.restoreTo(spark, t, ts1)
    assert(rts.nonEmpty)
    assert(visible(t) === Set(("a", 1, "x", "p1")))
    // the restore is itself a commit: travel back across it still works
    assert(TableOps.snapshotAsOf(spark, t, rts).count() === 1)
    // writes continue normally on the restored state
    TableOps.upsert(spark, t, rows(("c", 1, "z", "p1")))
    assert(visible(t) === Set(("a", 1, "x", "p1"), ("c", 1, "z", "p1")))
    // cleaner keeps the restored dirs (the latest manifest references
    // them) even when the pre-restore commits age out
    TableOps.clean(spark, t, retainCommits = 2)
    assert(visible(t) === Set(("a", 1, "x", "p1"), ("c", 1, "z", "p1")))
    // restoring past retention fails loudly instead of publishing a
    // manifest over cleaned dirs
    intercept[IllegalArgumentException] {
      TableOps.restoreTo(spark, t, "00000000000000000")
    }
  }

  test("GLOBAL MOR: fold after a restore rebuilds the index — no duplicate keys") {
    val g = KeyedTable("g3", s"${tmpDir("graft-mor-g3")}/g3", Seq("id"), "ver",
      Seq("part"), globalIndex = true)
    TableOps.upsert(spark, g, rows(("k", 1, "x", "p1")))
    val c2 = TableOps.deltaCommit(spark, g, rows(("k", 2, "x2", "p2")))
    // fold: index now maps k→p2, stamped for this delta-free commit
    TableOps.compactDeltas(spark, g)
    // restore to the MOR instant: base has k in p1 again, delta live
    TableOps.restoreTo(spark, g, c2)
    assert(TableOps.liveDeltaCommits(spark, g) === Seq(c2))
    // the fold must NOT trust the pre-restore index (it post-dates the
    // restored state yet can pass a naive staleness probe) — a stale
    // lookup would skip p1 and leave k duplicated
    TableOps.compactDeltas(spark, g)
    assert(TableOps.snapshot(spark, g)
      .filter(col("id") === "k").count() === 1)
    assert(visible(g) === Set(("k", 2, "x2", "p2")))
    assert(!TableOps.partitionDirs(spark, g).contains("part=p1"))
  }

  test("MOR split read treats pre-key-tracking sidecars as risky, not a crash") {
    val base = tmpDir("graft-mor-legacy")
    val v1 = KeyedTable("lg", s"$base/lg", Seq("id"), "ver",
      statsColumns = Seq("ver"))
    TableOps.upsert(spark, v1, spark.range(1, 51).selectExpr("id", "1 as ver"))
    // descriptor re-declared with the key tracked (to enable MOR
    // skipping); the OLD commit's sidecar has no min_id/max_id
    val v2 = v1.copy(statsColumns = Seq("ver", "id"))
    TableOps.deltaCommit(spark, v2, Seq((10L, 2)).toDF("id", "ver"))
    val got = TableOps.snapshotWhere(spark, v2, col("id") <= 20)
      .select("id", "ver").as[(Long, Int)].collect().toSet
    assert(got === (1L to 20L).map(i => (i, if (i == 10L) 2 else 1)).toSet)
  }

  test("replayed idempotent writes on MOR state skip without folding") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b1"))
    TableOps.deltaCommit(spark, t, rows(("b", 1, "y", "p1")))
    val commitsBefore = CommitLog(t, spark).listCommits()
    // a replayed batch publishes NOTHING — not even a compaction
    assert(TableOps.upsert(spark, t, rows(("a", 9, "no", "p1")),
      idempotencyKey = Some("b1")) === "")
    assert(TableOps.delete(spark, t, Seq("zzz").toDF("id"),
      idempotencyKey = Some("b1")) === "")
    assert(CommitLog(t, spark).listCommits() === commitsBefore)
    assert(TableOps.liveDeltaCommits(spark, t).size === 1)
  }

  test("savepoint pins a commit against retention; deleteSavepoint unpins") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1")))
    TableOps.upsert(spark, t, rows(("a", 3, "x3", "p1")))
    assert(TableOps.savepoint(spark, t, ts1) === ts1)
    TableOps.clean(spark, t, retainCommits = 1)
    // the pinned manifest and its dirs survived a retain-1 clean
    assert(TableOps.snapshotAsOf(spark, t, ts1)
      .select("ver").as[Int].collect().toSeq === Seq(1))
    TableOps.restoreTo(spark, t, ts1)
    assert(visible(t) === Set(("a", 1, "x", "p1")))
    // unpin: the old manifest may now age out, but the restore commit
    // itself references the dirs — state stays readable
    TableOps.deleteSavepoint(spark, t, ts1)
    TableOps.clean(spark, t, retainCommits = 1)
    assert(visible(t) === Set(("a", 1, "x", "p1")))

    // without a restore, unpinning releases the state for collection
    val u = table(partitioned = false)
    val uts = TableOps.upsert(spark, u, rows(("a", 1, "x", "p1")))
    TableOps.upsert(spark, u, rows(("a", 2, "x2", "p1")))
    TableOps.savepoint(spark, u, uts)
    TableOps.clean(spark, u, retainCommits = 1)
    TableOps.deleteSavepoint(spark, u, uts)
    TableOps.clean(spark, u, retainCommits = 1)
    intercept[IllegalArgumentException] {
      TableOps.snapshotAsOf(spark, u, uts)
    }
  }

  test("restoreTo preserves a MOR state's live deltas") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val d1 = TableOps.deltaCommit(spark, t, rows(("b", 1, "y", "p1")))
    TableOps.compactDeltas(spark, t)
    TableOps.delete(spark, t, Seq("b").toDF("id"))
    assert(visible(t) === Set(("a", 1, "x", "p1")))
    // restore to the MOR instant: base + live delta both come back
    TableOps.restoreTo(spark, t, d1)
    assert(TableOps.liveDeltaCommits(spark, t) === Seq(d1))
    assert(visible(t) === Set(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    // and the restored delta still folds
    TableOps.compactDeltas(spark, t)
    assert(visible(t) === Set(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
  }

  test("property: random batch schedule — MOR and COW snapshots stay identical") {
    val rnd = new scala.util.Random(42)
    val base = tmpDir("graft-mor-prop")
    val cow = KeyedTable("pc", s"$base/pc", Seq("id"), "ver", Seq("part"))
    val mor = KeyedTable("pm", s"$base/pm", Seq("id"), "ver", Seq("part"))
    def proj(t: KeyedTable) = TableOps.snapshot(spark, t)
      .select("id", "ver", "payload", "part")
      .as[(String, Int, String, String)].collect().toSet
    for (i <- 1 to 12) {
      // distinct keys per batch ⇒ no within-batch precombine ties (those
      // are documented arbitrary-deterministic; cross-batch ties resolve
      // by commit ts identically on both paths)
      val ks = rnd.shuffle((0 until 8).toList).take(1 + rnd.nextInt(5))
      val batch = rows(ks.map(k =>
        (s"k$k", rnd.nextInt(5), s"v$i-${rnd.nextInt(100)}",
          s"p${rnd.nextInt(3)}")): _*)
      TableOps.upsert(spark, cow, batch)
      TableOps.deltaCommit(spark, mor, batch)
      if (rnd.nextInt(3) == 0)
        TableOps.compactDeltas(spark, mor,
          sortBy = if (rnd.nextBoolean()) Seq("id") else Nil)
      if (i % 4 == 0) assert(proj(cow) === proj(mor), s"diverged at batch $i")
    }
    TableOps.compactDeltas(spark, mor, sortBy = Seq("id"))
    assert(proj(cow) === proj(mor))
  }

  test("schema evolution rides the delta path: new column visible, old rows null") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val evolved = Seq(("b", 1, "y", "p1", "extra"))
      .toDF("id", "ver", "payload", "part", "note")
    TableOps.deltaCommit(spark, t, evolved)
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("note"))
    val got = snap.select("id", "note").as[(String, Option[String])]
      .collect().toMap
    assert(got === Map("a" -> None, "b" -> Some("extra")))
    // survives compaction
    TableOps.compactDeltas(spark, t)
    assert(TableOps.snapshot(spark, t).columns.contains("note"))
  }
}
