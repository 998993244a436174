package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.functions._

/** Replace-commit family (insertOverwrite / insertOverwriteTable /
  * deletePartitions) and the batch CDC change log.
  */
class ReplaceCdcSpec extends SparkSuite {
  import spark.implicits._

  private def table(partitioned: Boolean, global: Boolean = false) = {
    val base = tmpDir("graft-replace")
    KeyedTable("t", s"$base/t", Seq("id"), "ver",
      if (partitioned) Seq("part") else Nil, globalIndex = global)
  }

  private def rows(rs: (String, Int, String, String)*) =
    rs.toDF("id", "ver", "payload", "part")

  private def state(t: KeyedTable) =
    TableOps.snapshot(spark, t).select("id", "ver", "payload", "part")
      .as[(String, Int, String, String)].collect().toSet

  test("insertOverwrite replaces only the batch's partitions") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(
      ("a", 1, "x", "p1"), ("b", 1, "y", "p1"), ("c", 1, "z", "p2")))
    val ts = TableOps.insertOverwrite(spark, t,
      rows(("a", 2, "x2", "p1"))) // b vanishes with its partition version
    assert(ts.nonEmpty)
    assert(state(t) === Set(
      ("a", 2, "x2", "p1"), ("c", 1, "z", "p2")))
    val meta = CommitLog(t, spark).commitMeta(ts).get
    assert(meta("action") === "replacecommit")
  }

  test("insertOverwrite on a fresh table is the first commit") {
    val t = table(partitioned = true)
    val ts = TableOps.insertOverwrite(spark, t, rows(("a", 1, "x", "p1")))
    assert(ts.nonEmpty)
    assert(state(t) === Set(("a", 1, "x", "p1")))
  }

  test("insertOverwrite dedups the batch under row identity") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.insertOverwrite(spark, t,
      rows(("a", 2, "lo", "p1"), ("a", 5, "hi", "p1")))
    assert(state(t) === Set(("a", 5, "hi", "p1")))
  }

  test("insertOverwrite folds live MOR deltas first") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("c", 1, "z", "p2")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "delta", "p1")))
    assert(TableOps.liveDeltaCommits(spark, t).nonEmpty)
    TableOps.insertOverwrite(spark, t, rows(("d", 1, "new", "p1")))
    // the delta row lived in the replaced partition: gone with it
    assert(state(t) === Set(("d", 1, "new", "p1"), ("c", 1, "z", "p2")))
    assert(TableOps.liveDeltaCommits(spark, t).isEmpty)
  }

  test("insertOverwrite refused on partitioned GLOBAL tables") {
    val t = table(partitioned = true, global = true)
    intercept[IllegalArgumentException] {
      TableOps.insertOverwrite(spark, t, rows(("a", 1, "x", "p1")))
    }
  }

  test("insertOverwriteTable replaces everything, old state time-travels") {
    val t = table(partitioned = true)
    val ts1 = TableOps.upsert(spark, t, rows(
      ("a", 1, "x", "p1"), ("c", 1, "z", "p2")))
    val ts2 = TableOps.insertOverwriteTable(spark, t,
      rows(("n", 1, "fresh", "p3")))
    assert(state(t) === Set(("n", 1, "fresh", "p3")))
    assert(TableOps.snapshotAsOf(spark, t, ts1)
      .select("id").as[String].collect().toSet === Set("a", "c"))
    val meta = CommitLog(t, spark).commitMeta(ts2).get
    assert(meta("action") === "replacecommit")
  }

  test("deletePartitions drops matching partitions metadata-only") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(
      ("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p3")))
    val before = TableOps.partitionDirs(spark, t)
    val ts = TableOps.deletePartitions(spark, t,
      col("part").isin("p1", "p3"))
    assert(ts.nonEmpty)
    assert(state(t) === Set(("b", 1, "y", "p2")))
    // pure metadata: no new data dir, survivor still owned by its old dir
    val fs = new org.apache.hadoop.fs.Path(t.dataPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t.dataPath}/$ts")))
    assert(TableOps.partitionDirs(spark, t) ===
      before.view.filterKeys(_ == "part=p2").toMap)
    assert(CommitLog(t, spark).commitMeta(ts).get("action")
      === "delete_partition")
  }

  test("deletePartitions with typed predicate over typed partition values") {
    val base = tmpDir("graft-replace")
    val t = KeyedTable("t", s"$base/t", Seq("id"), "ver", Seq("day"))
    val df = Seq(("a", 1, 20240101), ("b", 1, 20240102), ("c", 1, 20240103))
      .toDF("id", "ver", "day")
    TableOps.upsert(spark, t, df)
    TableOps.deletePartitions(spark, t, col("day") < 20240103)
    assert(TableOps.snapshot(spark, t).select("id").as[String]
      .collect().toSet === Set("c"))
  }

  test("deletePartitions: no match is a no-op, no commit published") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val n = CommitLog(t, spark).listCommits().size
    assert(TableOps.deletePartitions(spark, t, col("part") === "nope") === "")
    assert(CommitLog(t, spark).listCommits().size === n)
  }

  test("deletePartitions folds live deltas so dropped rows don't resurface") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("c", 1, "z", "p2")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "delta", "p1")))
    TableOps.deletePartitions(spark, t, col("part") === "p1")
    assert(state(t) === Set(("c", 1, "z", "p2")))
  }

  test("changeLog emits every intermediate version with its commit stamp") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val ts2 = TableOps.upsert(spark, t,
      rows(("a", 2, "x2", "p1"), ("b", 1, "y", "p1")))
    val ts3 = TableOps.upsert(spark, t, rows(("a", 3, "x3", "p1")))
    val changes = TableOps.changeLog(spark, t, beginExclusive = ts1)
      .select(col("id"), col("ver"), col(KeyedTable.CommitCol),
        col("_change_type"))
      .as[(String, Int, String, String)].collect().toSet
    assert(changes === Set(
      ("a", 2, ts2, "upsert"), ("b", 1, ts2, "upsert"),
      ("a", 3, ts3, "upsert")))
    // incremental() collapses the same range to latest-wins
    assert(TableOps.incremental(spark, t, ts1).select("id", "ver")
      .as[(String, Int)].collect().toSet === Set(("a", 3), ("b", 1)))
  }

  test("changeLog classifies soft-delete tombstones as deletes") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    TableOps.softDelete(spark, t, Seq("a").toDF("id"))
    val changes = TableOps.changeLog(spark, t, beginExclusive = ts1)
      .select(col("id"), col("_change_type"))
      .as[(String, String)].collect().toSet
    assert(changes === Set(("a", "delete")))
  }

  test("changeLog: compaction and restore emit nothing; replace emits its rows") {
    val t = table(partitioned = true)
    val ts1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("c", 1, "z", "p2")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "d", "p1")))
    val mark = CommitLog(t, spark).latestCommit().get
    TableOps.compactDeltas(spark, t)
    assert(TableOps.changeLog(spark, t, beginExclusive = mark).count() === 0)
    TableOps.restoreTo(spark, t, ts1)
    assert(TableOps.changeLog(spark, t, beginExclusive = mark).count() === 0)
    TableOps.insertOverwrite(spark, t, rows(("e", 1, "n", "p1")))
    assert(TableOps.changeLog(spark, t, beginExclusive = mark)
      .select("id").as[String].collect().toSet === Set("e"))
  }

  test("clean() collects a dropped partition's dir once retention passes") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("c", 1, "z", "p2")))
    val dirP1 = TableOps.partitionDirs(spark, t)("part=p1")
    TableOps.deletePartitions(spark, t, col("part") === "p1")
    val fs = new org.apache.hadoop.fs.Path(t.dataPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // still referenced by the pre-drop manifest → must survive a wide clean
    TableOps.clean(spark, t, retainCommits = 10)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dirP1)))
    // retention down to the drop commit only → the dir is unreferenced
    TableOps.clean(spark, t, retainCommits = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dirP1)))
    assert(state(t) === Set(("c", 1, "z", "p2")))
  }

  test("replace commit trips the lost-update tripwire under a concurrent write") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    // simulate a racing writer landing a commit between our read of the
    // timeline head and our publish: logCommit's expectedPrev must trip.
    // Easiest deterministic interleaving: publish a manifest directly
    // while insertOverwrite is mid-flight is racy; instead verify the
    // tripwire arms by replaying the internal contract — a manifest
    // whose expectedPrev no longer matches must throw.
    val log = CommitLog(t, spark)
    val head = log.latestCommit()
    TableOps.upsert(spark, t, rows(("b", 1, "y", "p1"))) // interloper
    intercept[java.util.ConcurrentModificationException] {
      log.logCommit(CommitLog.newCommitTs(),
        Map("table" -> t.name), expectedPrev = Some(head))
    }
  }

  test("lookupKeys returns exactly the probed keys' current rows") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(
      ("a", 1, "x", "p1"), ("b", 1, "y", "p1"), ("c", 1, "z", "p1")))
    TableOps.upsert(spark, t, rows(("b", 2, "y2", "p1")))
    val out = TableOps.lookupKeys(spark, t, Seq("b", "c", "nope").toDF("id"))
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(out === Set(("b", 2), ("c", 1)))
  }

  test("lookupKeys over the semi-join fallback matches the IN path") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(
      ("a", 1, "x", "p1"), ("b", 1, "y", "p1"), ("c", 1, "z", "p1")))
    val probes = Seq("a", "c").toDF("id")
    val small = TableOps.lookupKeys(spark, t, probes)
      .select("id").as[String].collect().toSet
    val big = TableOps.lookupKeys(spark, t, probes, maxProbes = 1)
      .select("id").as[String].collect().toSet
    assert(small === Set("a", "c"))
    assert(big === small)
  }

  test("lookupKeys sees MOR live-delta state") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.deltaCommit(spark, t, rows(("a", 2, "live", "p1")))
    val out = TableOps.lookupKeys(spark, t, Seq("a").toDF("id"))
      .select("ver").as[Int].collect().toSeq
    assert(out === Seq(2))
  }

  test("changeLog end bound is inclusive and begin exclusive") {
    val t = table(partitioned = false)
    val ts1 = TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    val ts2 = TableOps.upsert(spark, t, rows(("a", 2, "y", "p1")))
    TableOps.upsert(spark, t, rows(("a", 3, "z", "p1")))
    assert(TableOps.changeLog(spark, t, ts1, Some(ts2))
      .select("ver").as[Int].collect().toSeq === Seq(2))
  }
}
