package graft

import graft.ops.TableOps
import graft.pipeline.{IncrementalEtl, SeedTables}
import graft.tables.{CheckpointStore, Checkpoint}

/** End-to-end reference-flow test (SURVEY.md §5 item 4): seed → upsert
  * silver ×2 commits → incremental read → join → gold; checkpoint
  * advance; at-least-once replay idempotency; empty-increment
  * short-circuit; checkpoint-store KV surface.
  */
class PipelineSpec extends SparkSuite {

  test("seed → incremental ETL → gold; checkpoint advances; replay is idempotent") {
    val base = tmpDir("graft-pipe")
    SeedTables.seed(spark, base, nCustomers = 20, nOrders = 40)
    val gold1 = IncrementalEtl.run(spark, base)
    // every order has a matching customer (FK by construction,
    // create_hudi_tables.py:71,227-230) → gold == orders count
    assert(gold1.count() === 40)
    val goldTable = IncrementalEtl.goldTable(base)
    assert(TableOps.snapshot(spark, goldTable).count() === 40)
    // checkpoint advanced to the orders commit
    val store = CheckpointStore(s"$base/checkpoints", spark)
    val cp1 = store.get("orders")
    assert(cp1.isDefined && cp1.get.lastProcessedCommit.nonEmpty)

    // run again with no new data: empty increment, checkpoint untouched,
    // gold unchanged (I5)
    val gold2 = IncrementalEtl.run(spark, base)
    assert(gold2.isEmpty)
    assert(TableOps.snapshot(spark, goldTable).count() === 40)
    assert(store.get("orders").get.lastProcessedCommit
      === cp1.get.lastProcessedCommit)

    // second increment: 10 more orders (5 overlapping keys = updates)
    val custIds = TableOps.snapshot(spark, SeedTables.customersTable(base))
      .select("customer_id").collect().map(_.getString(0)).toSeq
    val more = SeedTables.orders(spark, 10, seed = 7L, custIds,
      epochDay = 19800)
    TableOps.upsert(spark, SeedTables.ordersTable(base), more)
    val gold3 = IncrementalEtl.run(spark, base)
    assert(gold3.count() === 10)
    assert(TableOps.snapshot(spark, goldTable).count() === 50)
    assert(store.get("orders").get.lastProcessedCommit
      > cp1.get.lastProcessedCommit)

    // at-least-once replay: wind the checkpoint back and re-run — the
    // upsert sink must absorb the duplicate increment (I3)
    store.put(cp1.get)
    val goldReplay = IncrementalEtl.run(spark, base)
    assert(goldReplay.count() === 10)
    assert(TableOps.snapshot(spark, goldTable).count() === 50,
      "replayed increment must not duplicate gold rows")
  }

  test("flagship pipeline end-to-end under object-store rename semantics") {
    // the reference's main() composition (incremental_etl_orders.py:
    // 454-496) — seed → incremental ETL → gold with checkpoints — plus
    // archival clean, all on the no-atomic-dir-rename shim FS: proves
    // checkpoint store, upsert, incremental read and timeline archival
    // are rename-safe TOGETHER, not just per-primitive
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[TrackingLocalFs].getName)
    TrackingLocalFs.reset()
    val base = s"graftfs:${tmpDir("graft-pipe-os")}"
    SeedTables.seed(spark, base, nCustomers = 12, nOrders = 25)
    val gold1 = IncrementalEtl.run(spark, base)
    assert(gold1.count() === 25)
    val goldTable = IncrementalEtl.goldTable(base)
    assert(TableOps.snapshot(spark, goldTable).count() === 25)
    // second increment through the same checkpointed flow
    val custIds = TableOps.snapshot(spark, SeedTables.customersTable(base))
      .select("customer_id").collect().map(_.getString(0)).toSeq
    TableOps.upsert(spark, SeedTables.ordersTable(base),
      SeedTables.orders(spark, 8, seed = 7L, custIds, epochDay = 19800))
    assert(IncrementalEtl.run(spark, base).count() === 8)
    assert(TableOps.snapshot(spark, goldTable).count() === 33)
    // archival clean on the gold table, then read back through the
    // archived timeline
    TableOps.clean(spark, goldTable, retainCommits = 1, archive = true)
    assert(TableOps.snapshot(spark, goldTable).count() === 33)
    assert(TableOps.timeline(spark, goldTable, includeArchived = true)
      .count() >= 2)
    assert(TrackingLocalFs.engineDirRenames.isEmpty,
      s"pipeline must not dir-rename: ${TrackingLocalFs.engineDirRenames}")
  }

  test("checkpoint store KV surface (S7: put/get/exists/delete/list/regex)") {
    val store = CheckpointStore(tmpDir("graft-cp"), spark)
    assert(!store.exists("t1"))
    store.put(Checkpoint("20240101000000000", "t1", "/p", "2024-01-01T00:00:00Z"))
    store.put(Checkpoint("20240102000000000", "t2", "/p2", "2024-01-02T00:00:00Z"))
    assert(store.exists("t1"))
    val got = store.get("t1").get
    assert(got.lastProcessedCommit === "20240101000000000")
    assert(got.path === "/p")
    assert(store.listKeys() === Seq("t1.json", "t2.json"))
    assert(store.findSimilarKeys("t1.*") === Seq("t1.json"))
    assert(store.delete("t1"))
    assert(!store.exists("t1"))
    assert(store.get("t1").isEmpty)
  }

  test("seed generator is deterministic") {
    val a = SeedTables.customers(spark, 5, 42L, 1704067200000L).collect()
    val b = SeedTables.customers(spark, 5, 42L, 1704067200000L).collect()
    assert(a === b)
    // partitioning must not change values: values are pure functions of
    // the row index, not of task/sequence order
    val one = SeedTables.customers(spark, 5, 42L, 1704067200000L)
      .repartition(1).orderBy("customer_id").collect()
    assert(one.toSeq === a.sortBy(_.getString(0)).toSeq)
    // the declarative uuid column equals the Scala uuidOf used for key
    // lists (both replicate java.util.UUID(hi, lo).toString)
    assert(a.map(_.getString(0)).toSeq ===
      (0 until 5).map(SeedTables.uuidOf(42L, _)))
  }
}
