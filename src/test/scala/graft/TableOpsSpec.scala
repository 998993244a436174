package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.functions._

/** Physical table lifecycle tests: COW upsert roundtrip, partition-
  * scoped rewrite, global-key partition moves, incremental reads
  * (bootstrap / resume / empty), commit log, cleaner.
  */
class TableOpsSpec extends SparkSuite {
  import spark.implicits._

  private def table(partitioned: Boolean, global: Boolean = false) = {
    val base = tmpDir("graft-tableops")
    KeyedTable("t", s"$base/t", Seq("id"), "ver",
      if (partitioned) Seq("part") else Nil, globalIndex = global)
  }

  private def rows(rs: (String, Int, String, String)*) =
    rs.toDF("id", "ver", "payload", "part")

  test("insert then snapshot roundtrip (unpartitioned)") {
    val t = table(partitioned = false)
    val ts = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    assert(ts.nonEmpty)
    val snap = TableOps.snapshot(spark, t)
    assert(snap.count() === 2)
    assert(snap.columns.contains(KeyedTable.CommitCol))
    assert(snap.select(KeyedTable.CommitCol).distinct().as[String].collect()
      === Array(ts))
  }

  test("storageAudit: clean table silent, crash debris flagged, clean reclaims") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")))
    // every dir is referenced by SOME retained manifest: nothing to report
    assert(TableOps.storageAudit(spark, t).count() === 0L)
    // crash debris: a commit-shaped data dir with no manifest
    val orphanTs = "29990101000000000"
    val dir = new java.io.File(s"${t.dataPath}/$orphanTs")
    dir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "part-0.parquet"),
      Array.fill[Byte](64)(1))
    val audit = TableOps.storageAudit(spark, t)
      .as[(String, String, String, Long, Long)].collect()
    assert(audit.toSeq === Seq(("data", orphanTs, "orphan", 1L, 64L)))
    // the cleaner collects exactly the audited set
    TableOps.clean(spark, t, retainCommits = 1)
    assert(TableOps.storageAudit(spark, t).count() === 0L)
    assert(!dir.exists())
    // table still reads after GC
    assert(TableOps.snapshot(spark, t).count() === 2L)
  }

  test("upsert updates existing keys, keeps untouched, logs commits") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    val ts2 = TableOps.upsert(spark, t, rows(("b", 2, "y2", "p1"), ("c", 1, "z", "p1")))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver", "payload").as[(String, Int, String)].collect().toSet
    assert(snap === Set(("a", 1, "x"), ("b", 2, "y2"), ("c", 1, "z")))
    assert(CommitLog(t, spark).listCommits() === Seq(ts1, ts2))
    // untouched row keeps its original commit stamp
    val aCommit = TableOps.snapshot(spark, t).filter($"id" === "a")
      .select(KeyedTable.CommitCol).as[String].head()
    assert(aCommit === ts1)
  }

  test("empty incoming batch is a no-op (no commit)") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val ts = TableOps.upsert(spark, t, rows().limit(0))
    assert(ts === "")
    assert(CommitLog(t, spark).listCommits().size === 1)
  }

  test("partitioned GLOBAL: only affected partitions rewritten; key move deletes old row") {
    val t = table(partitioned = true, global = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p3")))
    val p3Before = TableOps.partitionDirs(spark, t)("part=p3")
    // 'a' moves p1 → p2 (GLOBAL key semantics), p3 untouched
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2")))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
    assert(snap === Set(("a", 2, "p2"), ("b", 1, "p2"), ("c", 1, "p3")))
    val dirs = TableOps.partitionDirs(spark, t)
    assert(dirs("part=p3") === p3Before,
      "untouched partition must keep its original commit dir")
    assert(!dirs.contains("part=p1"),
      "emptied source partition must drop out of the table state")
  }

  test("numeric-string partition values survive read-back type inference") {
    // month='01' is written as dir month=01 but read back (inferred) as
    // int 1 — the moved-key delete must target the real on-disk dir.
    val base = tmpDir("graft-numpart")
    val t = KeyedTable("np", s"$base/np", Seq("id"), "ver", Seq("month"),
      globalIndex = true)
    def rows2(rs: (String, Int, String)*) = rs.toDF("id", "ver", "month")
    TableOps.upsert(spark, t, rows2(("a", 1, "01"), ("b", 1, "02")))
    // 'a' moves month 01 → 02; the emptied month=01 dir must go
    TableOps.upsert(spark, t, rows2(("a", 2, "02")))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(snap === Set(("a", 2), ("b", 1)),
      "stale row in the old numeric-string partition must be deleted")
  }

  test("incremental read: bootstrap, resume, empty range") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val ts2 = TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")))
    // bootstrap: begin="" reads everything
    assert(TableOps.incremental(spark, t, "").count() === 2)
    // resume: only the second commit's rows
    val inc = TableOps.incremental(spark, t, ts1)
    assert(inc.select("id").as[String].collect() === Array("b"))
    // bounded range ending before ts2
    assert(TableOps.incremental(spark, t, ts1, Some(ts1)).count() === 0)
    assert(TableOps.incremental(spark, t, ts2).count() === 0)
  }

  test("updated row moves into the new commit window (Hudi incremental semantics)") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1")))
    val inc = TableOps.incremental(spark, t, ts1)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(inc === Set(("a", 2)), "latest version of changed key only")
  }

  test("delete: keyed hard delete, partition-scoped, no-op on no match") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p2"),
        ("d", 1, "w", "p3")))
    val p3Before = TableOps.partitionDirs(spark, t)("part=p3")
    // delete 'a' (sole row of p1 → partition must go) and 'b' (p2 keeps 'c')
    val ts = TableOps.delete(spark, t, Seq("a", "b").toDF("id"))
    assert(ts.nonEmpty)
    val snap = TableOps.snapshot(spark, t)
      .select("id").as[String].collect().toSet
    assert(snap === Set("c", "d"))
    val dirs = TableOps.partitionDirs(spark, t)
    assert(!dirs.contains("part=p1"),
      "fully-deleted partition must drop out of the table state")
    assert(dirs("part=p3") === p3Before,
      "untouched partition must keep its original commit dir")
    // no matching keys: no commit
    val commits = graft.tables.CommitLog(t, spark).listCommits().size
    assert(TableOps.delete(spark, t, Seq("zzz").toDF("id")) === "")
    assert(graft.tables.CommitLog(t, spark).listCommits().size === commits)
    // deletion is itself a commit: time travel still sees 'a' before it
    val preDelete = graft.tables.CommitLog(t, spark).listCommits().head
    assert(TableOps.snapshotAsOf(spark, t, preDelete)
      .select("id").as[String].collect().toSet === Set("a", "b", "c", "d"))
  }

  test("deleteWhere: predicate delete removes matches, no-op otherwise") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 2, "y", "p2"), ("c", 3, "z", "p2"),
        ("d", 4, "w", "p3")))
    val ts = TableOps.deleteWhere(spark, t, col("ver") >= 3)
    assert(ts.nonEmpty)
    assert(TableOps.snapshot(spark, t)
      .select("id").as[String].collect().toSet === Set("a", "b"))
    // predicate matching nothing: no commit published
    val commits = graft.tables.CommitLog(t, spark).listCommits().size
    assert(TableOps.deleteWhere(spark, t, col("ver") > 1000) === "")
    assert(graft.tables.CommitLog(t, spark).listCommits().size === commits)
  }

  test("applyChanges: CDC batch applies, latest op per key wins, replay is idempotent") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p2")))
    // b updated; c deleted; d inserted; e updated THEN deleted (delete
    // wins); f deleted THEN inserted (insert wins, f was never present)
    val changes = Seq(
      ("b", 2, "y2", "p2", "U"),
      ("c", 2, "z", "p2", "D"),
      ("d", 2, "w", "p3", "I"),
      ("e", 2, "tmp", "p3", "U"), ("e", 3, "tmp", "p3", "D"),
      ("f", 2, "dead", "p3", "D"), ("f", 3, "alive", "p3", "I"))
      .toDF("id", "ver", "payload", "part", "_op")
    val published = TableOps.applyChanges(spark, t, changes,
      idempotencyKey = Some("cdc-batch-1"))
    assert(published.size === 2, "one upsert + one delete commit")
    val snap = TableOps.snapshot(spark, t)
      .select("id", "payload").as[(String, String)].collect().toMap
    assert(snap === Map("a" -> "x", "b" -> "y2", "d" -> "w",
      "f" -> "alive"))
    // replay with the same idempotency key: nothing new published
    val commits = graft.tables.CommitLog(t, spark).listCommits().size
    val replay = TableOps.applyChanges(spark, t, changes,
      idempotencyKey = Some("cdc-batch-1"))
    assert(replay.isEmpty)
    assert(graft.tables.CommitLog(t, spark).listCommits().size === commits)
  }

  test("applyChanges: missing partition columns fail with a clear message") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val bare = Seq(("a", 2, "x2", "U")).toDF("id", "ver", "payload", "_op")
    val e = intercept[IllegalArgumentException] {
      TableOps.applyChanges(spark, t, bare)
    }
    assert(e.getMessage.contains("part"), e.getMessage)
    assert(e.getMessage.contains("partition-scoped"), e.getMessage)
  }

  test("applyChanges: replayed old batch cannot re-delete a re-inserted key") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val b1 = Seq(("a", 2, "x", "p1", "D"))
      .toDF("id", "ver", "payload", "part", "_op")
    TableOps.applyChanges(spark, t, b1, idempotencyKey = Some("c1"))
    assert(TableOps.snapshot(spark, t).filter($"id" === "a").count() === 0)
    // a LATER batch re-inserts the key
    TableOps.applyChanges(spark, t,
      Seq(("a", 5, "back", "p1", "I"))
        .toDF("id", "ver", "payload", "part", "_op"),
      idempotencyKey = Some("c2"))
    // out-of-order replay of the OLD batch: its delete half carries its
    // own idempotency key, so the re-inserted row must survive
    val replay = TableOps.applyChanges(spark, t, b1,
      idempotencyKey = Some("c1"))
    assert(replay.isEmpty, s"replay must publish nothing, got $replay")
    assert(TableOps.snapshot(spark, t).filter($"id" === "a")
      .select("payload").as[String].collect() === Array("back"))
  }

  test("partition-scoped: same key in two partitions survives predicate ops on the other") {
    val t = table(partitioned = true)
    // one batch carrying BOTH partition copies of key 'a' — the batch
    // dedup must keep both (row identity is (key, partition) here)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("a", 1, "y", "p2"), ("b", 1, "z", "p2")))
    assert(TableOps.snapshot(spark, t).count() === 3)
    // deleteWhere matching only p1's copy must not kill p2's
    TableOps.deleteWhere(spark, t, col("payload") === "x")
    val snap = TableOps.snapshot(spark, t)
      .select("id", "payload", "part").as[(String, String, String)]
      .collect().toSet
    assert(snap === Set(("a", "y", "p2"), ("b", "z", "p2")))
    // applyChanges: a D aimed at p2's copy deletes ONLY that copy
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1")))
    TableOps.applyChanges(spark, t, Seq(("a", 3, "y", "p2", "D"))
      .toDF("id", "ver", "payload", "part", "_op"))
    assert(TableOps.snapshot(spark, t)
      .select("id", "part").as[(String, String)].collect().toSet
      === Set(("a", "p1"), ("b", "p2")))
  }

  test("deleteWhere matches rows living in the null (hive default) partition") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", null), ("b", 1, "y", "p1")))
    // EqualTo on a null partition key would silently never match —
    // the scoped delete must use null-safe equality
    val ts = TableOps.deleteWhere(spark, t, col("payload") === "x")
    assert(ts.nonEmpty, "null-partition row must be matched, not skipped")
    assert(TableOps.snapshot(spark, t)
      .select("id").as[String].collect().toSet === Set("b"))
  }

  test("applyChanges: D wins an equal-precombine tie; invalid op fails loud") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    // same key, same precombine value, U and D in one batch: the
    // tombstone must win deterministically
    TableOps.applyChanges(spark, t, Seq(
      ("a", 2, "resurrected?", "p1", "U"), ("a", 2, "x", "p1", "D"))
      .toDF("id", "ver", "payload", "part", "_op"))
    assert(TableOps.snapshot(spark, t).count() === 0)
    // invalid / null ops fail the job instead of mis-routing
    val bad = Seq(("b", 1, "y", "p1", "d"))
      .toDF("id", "ver", "payload", "part", "_op")
    val e = intercept[Exception] {
      TableOps.applyChanges(spark, t, bad)
    }
    assert(e.getMessage != null)
  }

  test("updateWhere: predicate update rewrites matches, bumps their commit ts") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 2, "y", "p2"), ("c", 3, "z", "p2")))
    val before = graft.tables.CommitLog(t, spark).latestCommit().get
    val ts = TableOps.updateWhere(spark, t, col("ver") >= 2,
      Map("payload" -> concat(col("payload"), lit("!"))))
    assert(ts.nonEmpty)
    val snap = TableOps.snapshot(spark, t)
    assert(snap.select("id", "payload").as[(String, String)].collect().toSet
      === Set(("a", "x"), ("b", "y!"), ("c", "z!")))
    // updated rows are change records of the new commit; untouched not
    val changed = TableOps.incremental(spark, t, before)
      .select("id").as[String].collect().toSet
    assert(changed === Set("b", "c"))
    // record-key columns are off-limits
    intercept[IllegalArgumentException] {
      TableOps.updateWhere(spark, t, col("ver") >= 2,
        Map("id" -> lit("nope")))
    }
  }

  test("schema evolution: upsert with a new column widens the table") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val widened = Seq(("b", 1, "y", "p1", "extra"))
      .toDF("id", "ver", "payload", "part", "note")
    TableOps.upsert(spark, t, widened)
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("note"))
    val byId = snap.select("id", "note").as[(String, Option[String])]
      .collect().toMap
    assert(byId === Map("a" -> None, "b" -> Some("extra")))
  }

  test("type-widening evolution: int batch into long table and vice versa") {
    val base = tmpDir("graft-widen")
    val t = KeyedTable("tw", s"$base/tw", Seq("id"), "ver")
    TableOps.upsert(spark, t, Seq(("a", 1, 5)).toDF("id", "ver", "n"))
    // wider incoming type: manifest must record the widened column and
    // the old int file must upcast at read
    TableOps.upsert(spark, t, Seq(("b", 1, 6000000000L)).toDF("id", "ver", "n"))
    val snap = TableOps.snapshot(spark, t)
    assert(snap.schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(snap.select("id", "n").as[(String, Long)].collect().toSet ===
      Set(("a", 5L), ("b", 6000000000L)))
    // narrower incoming type widens TO the table type
    TableOps.upsert(spark, t, Seq(("c", 1, 7)).toDF("id", "ver", "n"))
    val snap2 = TableOps.snapshot(spark, t)
    assert(snap2.schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(snap2.count() === 3)
  }

  test("soft delete: CDC-visible tombstone, active view hides, upsert resurrects") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    val ts2 = TableOps.softDelete(spark, t, Seq("a").toDF("id"))
    assert(ts2.nonEmpty)
    // full snapshot keeps the tombstoned version; active view hides it
    assert(TableOps.snapshot(spark, t).count() === 2)
    assert(TableOps.snapshotActive(spark, t)
      .select("id").as[String].collect().toSeq === Seq("b"))
    // incremental readers see the tombstone as a change record
    val inc = TableOps.incremental(spark, t, ts1)
      .select("id", TableOps.DeletedCol).as[(String, Boolean)].collect()
    assert(inc === Array(("a", true)))
    // a later plain upsert of the key resurrects it
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1")))
    assert(TableOps.snapshotActive(spark, t)
      .select("id").as[String].collect().toSet === Set("a", "b"))
  }

  test("partitioned soft delete: tombstones hidden regardless of footer sampling") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    // only p1 is rewritten with the _deleted column; p2's files lack it
    TableOps.softDelete(spark, t, Seq("a").toDF("id"))
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains(TableOps.DeletedCol),
      "manifest schema must expose evolved columns from every partition")
    assert(TableOps.snapshotActive(spark, t)
      .select("id").as[String].collect().toSeq === Seq("b"))
  }

  test("time travel works after partitioned schema evolution") {
    val t = table(partitioned = true)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    val ts2 = TableOps.upsert(spark, t, Seq(("a", 2, "x2", "p1", "n1"))
      .toDF("id", "ver", "payload", "part", "note"))
    TableOps.upsert(spark, t, Seq(("a", 3, "x3", "p1", "n2"))
      .toDF("id", "ver", "payload", "part", "note"))
    // as of ts2: current p2 (no note) unions archived p1 (has note)
    val at2 = TableOps.snapshotAsOf(spark, t, ts2)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(at2 === Set(("a", 2), ("b", 1)))
    val at1 = TableOps.snapshotAsOf(spark, t, ts1)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(at1 === Set(("a", 1), ("b", 1)))
  }

  test("deleting every row leaves a readable empty table") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    val ts = TableOps.delete(spark, t, Seq("a", "b").toDF("id"))
    assert(ts.nonEmpty)
    assert(TableOps.snapshot(spark, t).count() === 0)
    // and the table accepts a fresh upsert afterwards
    TableOps.upsert(spark, t, rows(("c", 1, "z", "p1")))
    assert(TableOps.snapshot(spark, t).select("id").as[String].collect()
      === Array("c"))
  }

  test("clean GCs only aged .tmp scratch entries") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = new org.apache.hadoop.fs.Path(s"${t.path}/.tmp/live-op")
    val stale = new org.apache.hadoop.fs.Path(s"${t.path}/.tmp/orphan-op")
    fs.mkdirs(fresh)
    fs.mkdirs(stale)
    fs.setTimes(stale, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    TableOps.clean(spark, t, retainCommits = 1)
    assert(fs.exists(fresh),
      "a recent scratch dir (possibly a live writer's) must survive clean()")
    assert(!fs.exists(stale), "an aged orphan scratch dir must be GC'd")
  }

  test("clean honors the .hb file beacon (the setTimes-free heartbeat channel)") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    // aged dir, FRESH beacon — a live multi-hour operation on a store
    // that rejects setTimes looks exactly like this: must survive
    val live = new org.apache.hadoop.fs.Path(s"${t.path}/.tmp/live-hb")
    fs.mkdirs(live)
    fs.create(new org.apache.hadoop.fs.Path(live, ".hb"), true).close()
    fs.setTimes(live, old, -1)
    // aged dir, aged beacon — a true orphan: must be collected
    val dead = new org.apache.hadoop.fs.Path(s"${t.path}/.tmp/dead-hb")
    fs.mkdirs(dead)
    val deadHb = new org.apache.hadoop.fs.Path(dead, ".hb")
    fs.create(deadHb, true).close()
    fs.setTimes(deadHb, old, -1)
    fs.setTimes(dead, old, -1)
    TableOps.clean(spark, t, retainCommits = 1)
    assert(fs.exists(live),
      "a fresh .hb beacon must keep an aged live dir past the GC")
    assert(!fs.exists(dead),
      "an aged dir whose beacon also aged is an orphan and must be GC'd")
  }

  test("clean input validation") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    intercept[IllegalArgumentException] {
      TableOps.clean(spark, t, retainCommits = 0)
    }
  }

  test("idempotency: manifest fallback covers a crash before the marker write") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b1"))
    // simulate the crash window: manifest published, marker lost
    val log = CommitLog(t, spark)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keysDir = new org.apache.hadoop.fs.Path(s"${t.commitsPath}/keys")
    fs.delete(keysDir, true)
    // the replay must still be skipped (manifest carries the key) and
    // the marker healed
    assert(TableOps.upsert(spark, t, rows(("a", 9, "x9", "p1")),
      idempotencyKey = Some("b1")) === "")
    assert(fs.exists(keysDir), "marker must be backfilled from the manifest")
    assert(log.listCommits() === Seq(ts1))
  }

  test("idempotency: fallback survives an interleaved commit in the crash window") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b1"))
    // crash window: manifest published, marker lost
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"${t.commitsPath}/keys"), true)
    // a maintenance commit lands BEFORE the replay — b1's manifest is no
    // longer the timeline head, so a latest-manifest-only fallback would
    // re-apply the batch
    val ts2 = TableOps.compact(spark, t)
    assert(CommitLog(t, spark).listCommits() === Seq(ts1, ts2))
    assert(TableOps.upsert(spark, t, rows(("a", 9, "x9", "p1")),
      idempotencyKey = Some("b1")) === "", "replayed batch must be skipped")
    assert(TableOps.snapshot(spark, t).select("ver").as[Int].collect()
      === Array(1), "the batch must have applied exactly once")
    // a genuinely new key still applies (the scan stops at b1's healed
    // marker instead of walking the whole timeline)
    assert(TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")),
      idempotencyKey = Some("b2")).nonEmpty)
  }

  test("idempotency: sealed watermark bounds the scan; walked commits are healed") {
    val t = table(partitioned = false)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def marker(key: String) = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      new org.apache.hadoop.fs.Path(s"${t.commitsPath}/keys/$h.key")
    }
    val sealedPath = new org.apache.hadoop.fs.Path(
      s"${t.commitsPath}/keys/_sealed")
    def readSeal(): String = {
      val in = fs.open(sealedPath)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim
      finally in.close()
    }
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b1"))
    TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")),
      idempotencyKey = Some("b2"))
    val log = CommitLog(t, spark)
    // b2's own pre-commit probe walked+verified the then-current
    // timeline and sealed it
    assert(fs.exists(sealedPath), "a completed probe must seal the timeline")
    // crash b2's marker (its commit sits ABOVE the seal): a fresh-key
    // probe walks past it, heals it, and advances the seal to the head
    fs.delete(marker("b2"), false)
    assert(!log.hasIdempotencyKey("fresh"))
    assert(fs.exists(marker("b2")),
      "a walked crash-window commit must have its marker healed")
    assert(readSeal() === log.latestCommit().get,
      "a completed probe must advance the seal to the newest commit")
    // at/below the seal the registry is authoritative: a keyed manifest
    // planted below the watermark (impossible under the monotonic
    // commit-ts contract) is structurally invisible — direct proof the
    // scan never re-reads sealed history
    val ghost = new org.apache.hadoop.fs.Path(
      s"${t.commitsPath}/00000000000000000.commit")
    val out = fs.create(ghost, true)
    try out.write("""{"idempotency_key":"ghost"}""".getBytes("UTF-8"))
    finally out.close()
    assert(!log.hasIdempotencyKey("ghost"),
      "scan must not read manifests at or below the sealed watermark")
  }

  test("withScratch heartbeats a live staging dir past clean()'s age gate") {
    val t = table(partitioned = false)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var scratch: org.apache.hadoop.fs.Path = null
    TableOps.withScratch(spark, t, "hbtest", heartbeatMs = 100L) { tmp =>
      scratch = tmp
      // age the dir far past the 1h orphan cutoff, as a multi-hour live
      // operation's staging dir would be without the heartbeat
      val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
      fs.setTimes(tmp, old, -1)
      val deadline = System.currentTimeMillis() + 10000
      var m = fs.getFileStatus(tmp).getModificationTime
      while (m <= old && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        m = fs.getFileStatus(tmp).getModificationTime
      }
      assert(m > old,
        "heartbeat must refresh a live staging dir's mtime so an " +
          "out-of-band clean() cannot GC it mid-operation")
      // the beat also lands on the setTimes-free channel
      val hb = new org.apache.hadoop.fs.Path(tmp, ".hb")
      val hbDeadline = System.currentTimeMillis() + 10000
      while (!fs.exists(hb) && System.currentTimeMillis() < hbDeadline)
        Thread.sleep(50)
      assert(fs.exists(hb),
        "heartbeat must maintain the .hb file beacon for stores " +
          "that reject setTimes")
    }
    assert(!fs.exists(scratch), "scratch dir must be removed in finally")
  }

  test("idempotency: out-of-order fresh keyed commit above a crashed one") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b1"))
    // crash window: b1's manifest is published but its marker is lost
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"${t.commitsPath}/keys"), true)
    // an out-of-order sink lands a FRESH keyed batch (marker complete)
    // on top of the crashed one — the early-exit scan alone would stop
    // here and wrongly re-apply b1 on replay
    assert(TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")),
      idempotencyKey = Some("b2")).nonEmpty)
    // replay of the crashed batch: must be skipped via the exhaustive
    // fallback scan, and applied exactly once overall
    assert(TableOps.upsert(spark, t, rows(("a", 9, "x9", "p1")),
      idempotencyKey = Some("b1")) === "", "crashed batch must not re-apply")
    assert(TableOps.snapshot(spark, t).filter($"id" === "a")
      .select("ver").as[Int].collect() === Array(1),
      "the crashed batch must have applied exactly once")
  }

  test("idempotency keys survive the cleaner") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")),
      idempotencyKey = Some("b1"))
    TableOps.upsert(spark, t, rows(("a", 2, "x", "p1")))
    TableOps.upsert(spark, t, rows(("a", 3, "x", "p1")))
    TableOps.clean(spark, t, retainCommits = 1)
    // manifest for b1's commit is gone, but the key registry remembers
    assert(TableOps.upsert(spark, t, rows(("a", 9, "x", "p1")),
      idempotencyKey = Some("b1")) === "")
  }

  test("time travel: snapshotAsOf reconstructs each commit's state (unpartitioned)") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    val ts2 = TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1"), ("c", 1, "z", "p1")))
    val ts3 = TableOps.upsert(spark, t, rows(("b", 9, "y9", "p1")))
    def at(ts: String) = TableOps.snapshotAsOf(spark, t, ts)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(at(ts1) === Set(("a", 1), ("b", 1)))
    assert(at(ts2) === Set(("a", 2), ("b", 1), ("c", 1)))
    assert(at(ts3) === Set(("a", 2), ("b", 9), ("c", 1)))
    // as-of the latest commit == current snapshot
    assert(at(ts3) === TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet)
  }

  test("time travel: partitioned, across a key move and a new partition") {
    val t = table(partitioned = true, global = true)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    val ts2 = TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2"), ("c", 1, "z", "p3")))
    def at(ts: String) = TableOps.snapshotAsOf(spark, t, ts)
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
    assert(at(ts1) === Set(("a", 1, "p1"), ("b", 1, "p2")),
      "moved key must appear in its ORIGINAL partition as of ts1")
    assert(at(ts2) === Set(("a", 2, "p2"), ("b", 1, "p2"), ("c", 1, "p3")))
  }

  test("cleaner drops unreferenced commit dirs beyond retention; time travel inside window survives") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val ts2 = TableOps.upsert(spark, t, rows(("a", 2, "x", "p1")))
    val ts3 = TableOps.upsert(spark, t, rows(("a", 3, "x", "p1")))
    TableOps.clean(spark, t, retainCommits = 2)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val kept = fs.listStatus(new org.apache.hadoop.fs.Path(t.dataPath))
      .map(_.getPath.getName).toSet
    assert(kept === Set(ts2, ts3),
      s"only dirs referenced by retained manifests survive, got $kept")
    // time travel to the oldest RETAINED commit still works
    assert(TableOps.snapshotAsOf(spark, t, ts2)
      .select("ver").as[Int].collect().toSeq === Seq(2))
    intercept[IllegalArgumentException] {
      TableOps.snapshotAsOf(spark, t, ts1)
    }
  }

  test("cleaner retains last N commit manifests") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val ts2 = TableOps.upsert(spark, t, rows(("a", 2, "x", "p1")))
    val ts3 = TableOps.upsert(spark, t, rows(("a", 3, "x", "p1")))
    val dropped = TableOps.clean(spark, t, retainCommits = 2)
    assert(dropped === Seq(ts1))
    assert(CommitLog(t, spark).listCommits() === Seq(ts2, ts3))
  }

  test("delete across schema evolution keeps evolved columns and partition identity") {
    // ADVICE r1: the partitioned-delete re-read must use the manifest
    // schema — footer sampling could drop evolved columns and partition
    // inference could rewrite month='01' as month=1.
    val base = tmpDir("graft-delevo")
    val t = KeyedTable("de", s"$base/de", Seq("id"), "ver", Seq("month"))
    def r(rs: (String, Int, String)*) = rs.toDF("id", "ver", "month")
    TableOps.upsert(spark, t, r(("a", 1, "01"), ("b", 1, "02"), ("c", 1, "02")))
    // evolve: note column lands only in month=01's files
    TableOps.upsert(spark, t, Seq(("d", 1, "01", "n1"))
      .toDF("id", "ver", "month", "note"))
    // delete across both partitions (02's files lack the evolved column)
    TableOps.delete(spark, t, Seq("a", "b").toDF("id"))
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("note"), "evolved column must survive delete")
    val byId = snap.select("id", "note", "month")
      .as[(String, Option[String], String)].collect().toSet
    assert(byId === Set(("c", None, "02"), ("d", Some("n1"), "01")),
      "numeric-string partition identity must survive the rewrite")
  }

  test("a truncated commit manifest does not brick reads") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a later, garbage manifest (simulated partial write by a legacy writer)
    val bad = new org.apache.hadoop.fs.Path(
      s"${t.commitsPath}/${CommitLog.newCommitTs()}.commit")
    val out = fs.create(bad, true)
    out.write("""{"table": "t", "schema": "{\"truncat""".getBytes)
    out.close()
    // snapshot falls back past the unparseable manifest; upsert still works
    assert(TableOps.snapshot(spark, t).count() === 1)
    TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")))
    assert(TableOps.snapshot(spark, t).count() === 2)
  }

  test("incremental read of a registered-but-never-written table is an empty increment") {
    val base = tmpDir("graft-nowrite")
    val t = KeyedTable("nw", s"$base/nw", Seq("id"), "ver")
    val store = graft.tables.CheckpointStore(s"$base/ckpt", spark)
    val inc = new graft.ops.IncrementalReader(store).read(spark, t)
    assert(inc.df.isEmpty)
    assert(inc.advanceTo.isEmpty)
    assert(inc.df.columns.contains("id"))
  }

  test("syncView: SQL sees the synced commit; re-sync after write refreshes") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val v = TableOps.syncView(spark, t, Some("sync_t"))
    assert(spark.sql(s"SELECT count(*) FROM $v").as[Long].head() === 1)
    TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")))
    // like Hudi hive-sync, the view pins the synced commit until re-sync
    assert(spark.sql(s"SELECT count(*) FROM $v").as[Long].head() === 1)
    TableOps.syncView(spark, t, Some("sync_t"))
    assert(spark.sql(s"SELECT count(*) FROM $v").as[Long].head() === 2)
  }

  test("mid-commit crash states are invisible to readers (manifest-pointer protocol)") {
    // The commit sequence is: (1) write a fresh data dir, (2) publish
    // one manifest file. Readers must see a consistent snapshot after
    // ANY prefix of that sequence — including a manifest that an object
    // store's non-atomic copy left truncated.
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    def state() = TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet
    val before = state()
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash state 1: data dir fully written, no manifest → invisible
    val orphanTs = CommitLog.newCommitTs()
    rows(("a", 9, "boom", "p1")).write
      .partitionBy("part").parquet(s"${t.dataPath}/$orphanTs")
    assert(state() === before, "unreferenced commit dir must be invisible")
    // crash state 2: manifest half-copied (truncated) → skipped
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"${t.commitsPath}/$orphanTs.commit"), true)
    out.write("""{"table": "t", "parts": "{\"par""".getBytes)
    out.close()
    assert(state() === before, "truncated manifest must be skipped")
    // the table still accepts new commits, and the cleaner collects
    // the orphan dir (it is referenced by no retained manifest)
    TableOps.upsert(spark, t, rows(("c", 1, "z", "p1")))
    TableOps.clean(spark, t, retainCommits = 10)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t.dataPath}/$orphanTs")),
      "cleaner must collect orphan commit dirs")
    assert(state() === before + (("c", 1)))
  }

  test("clean() and first-commit upsert never touch foreign data") {
    // a bare-parquet dir someone else wrote under the table's data path
    val base = tmpDir("graft-foreign")
    val t = KeyedTable("fx", s"$base/fx", Seq("id"), "ver")
    // the natural interop layout: parquet files directly under data/
    rows(("x", 1, "p", "p1")).write.parquet(t.dataPath)
    // no manifests → nothing is ours to collect
    TableOps.clean(spark, t, retainCommits = 1)
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(t.dataPath))
      .exists(_.getPath.getName.endsWith(".parquet")),
      "cleaner must never delete non-commit-shaped entries")
    // first commit refuses to adopt (publishing would hide those rows)
    intercept[IllegalArgumentException] {
      TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    }
    // the bare dir stays readable via the interop fallback
    assert(TableOps.snapshot(spark, t).count() === 1)
  }

  test("lost-update tripwire: a racing commit on the same base is rejected") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val log = CommitLog(t, spark)
    val base = log.latestCommit()
    // writer B publishes while writer A (simulated below) is mid-commit
    TableOps.upsert(spark, t, rows(("b", 1, "y", "p1")))
    // writer A's publish — computed on the stale base — must throw, not
    // silently hide B's commit
    intercept[java.util.ConcurrentModificationException] {
      log.logCommit(CommitLog.newCommitTs(),
        Map("table" -> "t"), expectedPrev = Some(base))
    }
  }

  test("filesView: base ownership per partition, live deltas, cleaned-up after compaction") {
    val t = table(partitioned = true)
    val c1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    val c2 = TableOps.deltaCommit(spark, t, rows(("a", 2, "x2", "p1")))
    val fv = TableOps.filesView(spark, t)
      .select("rel", "commit_ts", "role", "n_files")
      .as[(String, String, String, Long)].collect()
    assert(fv.filter(_._3 == "base").map(r => (r._1, r._2)).toSet ===
      Set(("part=p1", c1), ("part=p2", c1)))
    assert(fv.filter(_._3 == "delta").map(_._2).toSeq === Seq(c2))
    assert(fv.forall(_._4 >= 1))
    // after compaction the delta row disappears and ownership moves
    TableOps.compactDeltas(spark, t)
    val fv2 = TableOps.filesView(spark, t)
      .select("role").as[String].collect()
    assert(!fv2.contains("delta"))
  }

  test("commit timestamps are strictly monotonic") {
    val ts = (1 to 50).map(_ => CommitLog.newCommitTs())
    assert(ts === ts.sorted)
    assert(ts.distinct.size === ts.size)
  }

  test("diff: classifies net insert/update/delete; rewrites are silent") {
    val t = table(partitioned = false)
    val c1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1"), ("c", 1, "z", "p1")))
    // b updated, d inserted; a merely rides along via compaction later
    TableOps.upsert(spark, t, rows(("b", 2, "y2", "p1"), ("d", 1, "w", "p1")))
    val c3 = TableOps.delete(spark, t, Seq("c").toDF("id"))
    val d = TableOps.diff(spark, t, c1, c3)
      .select("id", "change", "ver", "payload")
      .as[(String, String, Int, String)].collect().sortBy(_._1)
    assert(d === Array(
      ("b", "update", 2, "y2"),
      ("c", "delete", 1, "z"),
      ("d", "insert", 1, "w")))
    // a whole-table rewrite between the instants reports nothing:
    // net state is identical even though every file moved
    val c4 = TableOps.insertOverwriteTable(spark, t,
      TableOps.snapshot(spark, t).drop(KeyedTable.CommitCol))
    assert(TableOps.diff(spark, t, c3, c4).count() === 0)
  }

  test("diff: schema evolution null-backfills the older side; pred scopes") {
    val t = table(partitioned = false)
    val c1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    // widened batch: extra column only on the newer side
    val c2 = TableOps.upsert(spark, t,
      Seq(("a", 2, "x", "p1", "ex")).toDF("id", "ver", "payload", "part", "extra"))
    val d = TableOps.diff(spark, t, c1, c2)
      .select("id", "change", "extra")
      .as[(String, String, Option[String])].collect()
    // only 'a' changed; 'b' widened to NULL extra on BOTH sides — silent
    assert(d === Array(("a", "update", Some("ex"))))
    val scoped = TableOps.diff(spark, t, c1, c2,
      pred = Some($"id" === "b"))
    assert(scoped.count() === 0)
  }
}
