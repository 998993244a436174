package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.functions._

/** The two round-8 write-surface additions through the full table
  * lifecycle: [[TableOps.insertInto]] (Hudi `insert`, no-dedup — keys
  * duplicate instead of merging) and `upsert(partial = true)` (Hudi
  * `PartialUpdateAvroPayload` — per-column latest-non-null).
  */
class InsertPartialSpec extends SparkSuite {
  import spark.implicits._

  private def table(partitioned: Boolean, global: Boolean = false) = {
    val base = tmpDir("graft-inspartial")
    KeyedTable("t", s"$base/t", Seq("id"), "ver",
      if (partitioned) Seq("part") else Nil, globalIndex = global)
  }

  private def rows(rs: (String, Int, String, String)*) =
    rs.toDF("id", "ver", "payload", "part")

  private def state(t: KeyedTable) =
    TableOps.snapshot(spark, t)
      .select("id", "ver", "payload").as[(String, Int, String)]
      .collect().toSet

  test("insertInto: duplicate keys are added, not merged") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    val ts = TableOps.insertInto(spark, t, rows(("a", 2, "x2", "p1")))
    assert(ts.nonEmpty)
    assert(state(t) ===
      Set(("a", 1, "x"), ("a", 2, "x2"), ("b", 1, "y")))
    // a later UPSERT collapses the duplicated key to its greatest
    // precombine version (Hudi upsert-after-insert behavior)
    TableOps.upsert(spark, t, rows(("a", 3, "x3", "p1")))
    assert(state(t) === Set(("a", 3, "x3"), ("b", 1, "y")))
  }

  test("insertInto: first commit on a fresh table is the bulk-load path") {
    val t = table(partitioned = false)
    val ts = TableOps.insertInto(spark, t,
      rows(("a", 1, "x", "p1"), ("a", 1, "x", "p1")))
    assert(ts.nonEmpty)
    // even within-batch duplicates survive — no combine anywhere
    assert(TableOps.snapshot(spark, t).count() === 2)
    assert(CommitLog(t, spark).commitMeta(ts)
      .exists(_.get("action").contains("insert")))
  }

  test("insertInto: partitioned — untouched partitions keep their dirs") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    val before = TableOps.partitionDirs(spark, t)
    TableOps.insertInto(spark, t, rows(("a", 2, "x2", "p1")))
    val after = TableOps.partitionDirs(spark, t)
    assert(after("part=p2") === before("part=p2"))
    assert(after("part=p1") !== before("part=p1"))
    assert(state(t) ===
      Set(("a", 1, "x"), ("a", 2, "x2"), ("b", 1, "y")))
  }

  test("insertInto: refused under a GLOBAL key index") {
    val t = table(partitioned = true, global = true)
    intercept[IllegalArgumentException] {
      TableOps.insertInto(spark, t, rows(("a", 1, "x", "p1")))
    }
  }

  test("insertInto: empty batch and idempotent replay are no-ops") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    assert(TableOps.insertInto(spark, t, rows().limit(0)) === "")
    val ts = TableOps.insertInto(spark, t, rows(("b", 1, "y", "p1")),
      idempotencyKey = Some("batch-7"))
    assert(ts.nonEmpty)
    assert(TableOps.insertInto(spark, t, rows(("b", 1, "y", "p1")),
      idempotencyKey = Some("batch-7")) === "")
    assert(CommitLog(t, spark).listCommits().size === 2)
  }

  test("insertInto: wider batch widens the schema, old rows NULL-backfill") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1")))
    TableOps.insertInto(spark, t,
      Seq(("b", 1, "y", "p1", 42)).toDF("id", "ver", "payload", "part", "extra"))
    val snap = TableOps.snapshot(spark, t)
    assert(snap.columns.contains("extra"))
    assert(snap.select("id", "extra").as[(String, Option[Int])]
      .collect().toSet === Set(("a", None), ("b", Some(42))))
  }

  test("insertInto: CDC emits only the inserted rows") {
    val t = table(partitioned = false)
    val c1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    TableOps.insertInto(spark, t, rows(("a", 2, "x2", "p1")))
    val changes = TableOps.changeLog(spark, t, beginExclusive = c1)
      .select("id", "ver", "_change_type").as[(String, Int, String)]
      .collect().toSet
    // the rewritten a/b ver-1 rows keep their c1 stamps — invisible
    assert(changes === Set(("a", 2, "upsert")))
  }

  test("insertInto: incremental read sees the batch, not the rewrite") {
    val t = table(partitioned = false)
    val c1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    TableOps.insertInto(spark, t, rows(("c", 1, "z", "p1")))
    assert(TableOps.incremental(spark, t, beginExclusive = c1)
      .select("id").as[String].collect().toSet === Set("c"))
  }

  test("partial upsert: sparse batch keeps stored values (unpartitioned)") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p1")))
    TableOps.upsert(spark, t,
      Seq(("a", 2, Option.empty[String], "p1")).toDF("id", "ver", "payload", "part"),
      partial = true)
    assert(state(t) === Set(("a", 2, "x"), ("b", 1, "y")))
  }

  test("partial upsert: partitioned — per-column resolution inside the partition") {
    val t = table(partitioned = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    TableOps.upsert(spark, t,
      Seq(("a", 2, Option.empty[String], "p1")).toDF("id", "ver", "payload", "part"),
      partial = true)
    assert(state(t) === Set(("a", 2, "x"), ("b", 1, "y")))
    // the untouched partition p2 kept its dir
    assert(TableOps.partitionDirs(spark, t).contains("part=p2"))
  }

  test("partial upsert: stale sparse update cannot regress newer columns") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t, rows(("a", 5, "new", "p1")))
    TableOps.upsert(spark, t, rows(("a", 2, "stale", "p1")), partial = true)
    assert(state(t) === Set(("a", 5, "new")))
  }

  test("partial upsert: within-batch sparse updates fold before the merge") {
    val t = table(partitioned = false)
    TableOps.upsert(spark, t,
      Seq(("a", 1, Option.empty[String], "p1"), ("a", 2, Some("v2"), "p1"),
        ("a", 3, Option.empty[String], "p1"))
        .toDF("id", "ver", "payload", "part"),
      partial = true)
    assert(state(t) === Set(("a", 3, "v2")))
  }
}
