package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.functions._

/** Non-additive schema evolution via column mapping
  * ([[TableOps.renameColumn]] / [[TableOps.dropColumn]], the Hudi 1.0 /
  * Delta columnMapping analog): metadata-only rename/drop, pre-rename
  * files readable under the new name, exact time travel across the
  * surgery, MOR-state coverage, and the retired-name resurrection
  * guards.
  */
class SchemaMappingSpec extends SparkSuite {
  import spark.implicits._

  private def freshBase = tmpDir("graft-colmap")

  private def seed(path: String, partitioned: Boolean = false) = {
    val t =
      if (partitioned)
        KeyedTable("cm", path, Seq("id"), "ver", partitionBy = Seq("part"))
      else KeyedTable("cm", path, Seq("id"), "ver")
    TableOps.upsert(spark, t,
      Seq(("a", 1, 10.0, "p1"), ("b", 1, 20.0, "p2"))
        .toDF("id", "ver", "amount", "part"))
    t
  }

  test("rename: old files readable under the new name, values exact") {
    val t = seed(s"$freshBase/cm")
    val preTs = CommitLog(t, spark).latestCommit().get
    val rts = TableOps.renameColumn(spark, t, "amount", "total")
    assert(rts.nonEmpty)
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("total") && !snap.columns.contains("amount"))
    assert(snap.select("id", "total").as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0)))
    // post-rename write under the new name merges across eras
    TableOps.upsert(spark, t,
      Seq(("a", 2, 11.0, "p1"), ("c", 1, 30.0, "p3"))
        .toDF("id", "ver", "total", "part"))
    assert(TableOps.snapshot(spark, t).select("id", "total")
      .as[(String, Double)].collect().toSet
      === Set(("a", 11.0), ("b", 20.0), ("c", 30.0)))
    // time travel to before the rename: OLD name, same values — exact
    val asOf = TableOps.snapshotAsOf(spark, t, preTs)
    assert(asOf.columns.contains("amount") && !asOf.columns.contains("total"))
    assert(asOf.select("id", "amount").as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0)))
  }

  test("rename on MOR live-delta state; compaction folds across eras") {
    val t = seed(s"$freshBase/cm")
    TableOps.deltaCommit(spark, t,
      Seq(("b", 2, 21.0, "p2")).toDF("id", "ver", "amount", "part"))
    TableOps.renameColumn(spark, t, "amount", "total")
    TableOps.deltaCommit(spark, t,
      Seq(("a", 2, 12.0, "p1")).toDF("id", "ver", "total", "part"))
    val expect = Set(("a", 12.0), ("b", 21.0))
    assert(TableOps.snapshot(spark, t).select("id", "total")
      .as[(String, Double)].collect().toSet === expect)
    TableOps.compactDeltas(spark, t)
    assert(TableOps.liveDeltaCommits(spark, t).isEmpty)
    assert(TableOps.snapshot(spark, t).select("id", "total")
      .as[(String, Double)].collect().toSet === expect)
  }

  test("rename is CDC/incremental-invisible; feeds span it unharmed") {
    val t = seed(s"$freshBase/cm")
    val preTs = CommitLog(t, spark).latestCommit().get
    TableOps.renameColumn(spark, t, "amount", "total")
    TableOps.upsert(spark, t,
      Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "total", "part"))
    val changes = TableOps.changeLog(spark, t, beginExclusive = preTs)
    assert(changes.select("id").as[String].collect().toSeq === Seq("c"))
    assert(TableOps.incremental(spark, t, beginExclusive = preTs)
      .select("id").as[String].collect().toSeq === Seq("c"))
  }

  test("partitioned rename: partition-scoped post-rename rewrite, mixed eras") {
    val t = seed(s"$freshBase/cm", partitioned = true)
    TableOps.renameColumn(spark, t, "amount", "total")
    val before = TableOps.partitionDirs(spark, t)
    TableOps.upsert(spark, t,
      Seq(("a", 2, 12.0, "p1")).toDF("id", "ver", "total", "part"))
    val after = TableOps.partitionDirs(spark, t)
    // p2 untouched: still owned by the PRE-rename commit dir, read
    // through the mapping
    assert(after("part=p2") === before("part=p2"))
    assert(TableOps.snapshot(spark, t).select("id", "total", "part")
      .as[(String, Double, String)].collect().toSet
      === Set(("a", 12.0, "p1"), ("b", 20.0, "p2")))
  }

  test("rename back to a prior name resolves every era correctly") {
    val t = seed(s"$freshBase/cm")
    TableOps.renameColumn(spark, t, "amount", "total")
    TableOps.upsert(spark, t,
      Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "total", "part"))
    TableOps.renameColumn(spark, t, "total", "amount")
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("amount"))
    assert(snap.select("id", "amount").as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0), ("c", 30.0)))
  }

  test("drop: hidden now, visible in time travel; retired names refuse re-add") {
    val t = seed(s"$freshBase/cm")
    val preTs = CommitLog(t, spark).latestCommit().get
    TableOps.renameColumn(spark, t, "amount", "total")
    TableOps.dropColumn(spark, t, "total")
    val snap = TableOps.snapshot(spark, t)
    assert(!snap.columns.contains("total") && !snap.columns.contains("amount"))
    assert(snap.select("id").as[String].collect().toSet === Set("a", "b"))
    // time travel before the drop still sees the column
    assert(TableOps.snapshotAsOf(spark, t, preTs).columns.contains("amount"))
    // re-adding the dropped name OR its pre-rename physical ancestor
    // would resurrect old bytes — refused loudly
    intercept[IllegalArgumentException] {
      TableOps.upsert(spark, t,
        Seq(("d", 1, 99.0, "p4")).toDF("id", "ver", "total", "part"))
    }
    intercept[IllegalArgumentException] {
      TableOps.upsert(spark, t,
        Seq(("d", 1, 99.0, "p4")).toDF("id", "ver", "amount", "part"))
    }
    // a fresh name is fine
    TableOps.upsert(spark, t,
      Seq(("d", 1, 99.0, "p4")).toDF("id", "ver", "amount2", "part"))
    assert(TableOps.snapshot(spark, t).columns.contains("amount2"))
  }

  test("post-rename write under the OLD name fails loud, not split-brain") {
    val t = seed(s"$freshBase/cm")
    TableOps.renameColumn(spark, t, "amount", "total")
    intercept[IllegalArgumentException] {
      TableOps.upsert(spark, t,
        Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "amount", "part"))
    }
  }

  test("restore across a rename republishes the old-name state readable") {
    val t = seed(s"$freshBase/cm")
    val preTs = CommitLog(t, spark).latestCommit().get
    TableOps.renameColumn(spark, t, "amount", "total")
    TableOps.upsert(spark, t,
      Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "total", "part"))
    TableOps.restoreTo(spark, t, preTs)
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("amount"))
    assert(snap.select("id", "amount").as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0)))
  }

  test("pushdown: a predicate on the renamed column reaches pre-rename files") {
    val t = seed(s"$freshBase/cm")
    TableOps.renameColumn(spark, t, "amount", "total")
    val df = TableOps.snapshot(spark, t).filter(col("total") > 15.0)
    // the logical-name filter must cross the restore projection and
    // reach the parquet scan under the PHYSICAL name — at 100 TB a
    // renamed column that stops pushing down is a silent full-scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(amount,15.0)"),
      s"predicate did not reach the scan under the physical name:\n$plan")
    assert(df.select("id").as[String].collect().toSeq === Seq("b"))
  }

  test("stats table: renaming a NON-stats column keeps pruned reads exact") {
    val base = freshBase
    val t = KeyedTable("cmp", s"$base/cmp", Seq("id"), "ver",
      statsColumns = Seq("id"))
    TableOps.upsert(spark, t,
      Seq(("a", 1, 10.0, "p1"), ("b", 1, 20.0, "p2"))
        .toDF("id", "ver", "amount", "part"))
    TableOps.renameColumn(spark, t, "amount", "total")
    // snapshotWhere takes the ColumnStats.prunedRead path (stats
    // table) — pre-rename files must yield real values, never NULLs
    val got = TableOps.snapshotWhere(spark, t, col("id") === "b")
      .select("id", "total").as[(String, Double)].collect().toSet
    assert(got === Set(("b", 20.0)))
    // MOR split read face: a live delta forces morSplitRead
    TableOps.deltaCommit(spark, t,
      Seq(("a", 2, 11.0, "p1")).toDF("id", "ver", "total", "part"))
    val got2 = TableOps.snapshotWhere(spark, t, col("total") > 5.0)
      .select("id", "total").as[(String, Double)].collect().toSet
    assert(got2 === Set(("a", 11.0), ("b", 20.0)))
  }

  test("forward mapping: a stale (pre-rename) schema reads post-rename files") {
    // the running-stream shape: schema captured before a mid-stream
    // rename, commits written after it — physicalFor's forward pass
    // must roll the old name up to the file's era, not read NULLs
    val t = seed(s"$freshBase/cm")
    val oldSch = TableOps.latestSchema(spark, t).get
    assert(oldSch.fieldNames.contains("amount"))
    TableOps.renameColumn(spark, t, "amount", "total")
    val newTs = TableOps.upsert(spark, t,
      Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "total", "part"))
    val rens = graft.tables.CommitLog(t, spark).renames()
    val got = TableOps.readCommitDir(spark, Some(oldSch), rens, newTs,
        s"${t.dataPath}/$newTs")
      .select("id", "amount").as[(String, Double)].collect().toSet
    assert(got === Set(("a", 10.0), ("b", 20.0), ("c", 30.0)))
  }

  test("restore across a rename: undone-era files stay exact, re-add refused") {
    val t = seed(s"$freshBase/cm")
    val preTs = CommitLog(t, spark).latestCommit().get
    TableOps.renameColumn(spark, t, "amount", "total")
    val undoneTs = TableOps.upsert(spark, t,
      Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "total", "part"))
    TableOps.restoreTo(spark, t, preTs)
    // current state: old name, pre-rename rows only
    assert(TableOps.snapshot(spark, t).select("id", "amount")
      .as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0)))
    // time travel INTO the undone era: new name, undone-era files
    // resolve through the inverse lineage entries
    val undone = TableOps.snapshotAsOf(spark, t, undoneTs)
    assert(undone.columns.contains("total"))
    assert(undone.select("id", "total").as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0), ("c", 30.0)))
    // re-adding the undone NEW name post-restore is refused (the
    // stale forward entry would remap it onto pre-rename files)
    intercept[IllegalArgumentException] {
      TableOps.upsert(spark, t,
        Seq(("d", 1, 99.0, "p4")).toDF("id", "ver", "total", "part"))
    }
    // post-restore writes under the restored old name work and read
    val postTs = TableOps.upsert(spark, t,
      Seq(("d", 1, 99.0, "p4")).toDF("id", "ver", "amount", "part"))
    assert(postTs.nonEmpty)
    assert(TableOps.snapshot(spark, t).select("id", "amount")
      .as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0), ("d", 99.0)))
  }

  test("insert_overwrite honors the retired-name guard pre-write") {
    val t = seed(s"$freshBase/cm", partitioned = true)
    TableOps.renameColumn(spark, t, "amount", "total")
    intercept[IllegalArgumentException] {
      TableOps.insertOverwrite(spark, t,
        Seq(("a", 2, 12.0, 1.0, "p1"))
          .toDF("id", "ver", "total", "amount", "part"))
    }
  }

  test("rename target must not collide with structural/system names") {
    val t = seed(s"$freshBase/cm")
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "amount", "_deleted")
    }
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "amount", KeyedTable.CommitCol)
    }
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "amount", "id") // record key
    }
  }

  test("surgery refusals: structural, stats-tracked, existing target") {
    val base = freshBase
    val t = seed(s"$base/cm")
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "id", "id2") // record key
    }
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "ver", "rev") // precombine
    }
    intercept[IllegalArgumentException] {
      TableOps.dropColumn(spark, t, "id")
    }
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "amount", "part") // target exists
    }
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "nope", "x") // no such column
    }
    val ts = KeyedTable("cms", s"$base/cms", Seq("id"), "ver",
      statsColumns = Seq("amount"))
    TableOps.upsert(spark, ts,
      Seq(("a", 1, 10.0, "p1")).toDF("id", "ver", "amount", "part"))
    intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, ts, "amount", "total") // stats-tracked
    }
  }

  test("rename onto a DIFFERENT column's retired physical name is refused") {
    val t = seed(s"$freshBase/cm")
    // era 1: amount→total retires physical name 'amount'
    TableOps.renameColumn(spark, t, "amount", "total")
    // a file written IN the total-era stores physical 'total'
    TableOps.upsert(spark, t,
      Seq(("c", 1, 30.0, "p3")).toDF("id", "ver", "total", "part"))
    // add an unrelated column, then try to rename IT onto the retired
    // 'amount': the stale (t1, amount, total) lineage entry would
    // forward-map the reused name onto 'total' for total-era files —
    // a duplicate physical schema. Must refuse.
    TableOps.upsert(spark, t,
      Seq(("d", 1, 40.0, "p4", 7.0)).toDF("id", "ver", "total", "part", "extra"))
    val ex = intercept[IllegalArgumentException] {
      TableOps.renameColumn(spark, t, "extra", "amount")
    }
    assert(ex.getMessage.contains("retired physical name"))
    // every era still reads exactly (no lineage corruption happened)
    assert(TableOps.snapshot(spark, t).select("id", "total")
      .as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0)))
    // rename-BACK of the same column stays allowed (lineage chain from
    // the reused name resolves to the column being renamed)
    TableOps.renameColumn(spark, t, "total", "amount")
    assert(TableOps.snapshot(spark, t).select("id", "amount")
      .as[(String, Double)].collect().toSet
      === Set(("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0)))
  }
}
