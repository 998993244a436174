package graft

import graft.ops.{IncrementalAgg, TableOps}
import graft.tables.{Checkpoint, CheckpointStore, KeyedTable}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: state == full recompute after
  * every refresh, empty increments are no-ops, and a crash-replay
  * (checkpoint rolled back after the state write) must NOT double-count
  * — the idempotency key is what makes aggregate merges exactly-once.
  */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def fullAgg(rows: Seq[(Long, String, Long)]) =
    rows.groupBy(_._2).map { case (g, rs) =>
      (g, rs.size.toLong, rs.map(_._3).sum, rs.map(_._3).min, rs.map(_._3).max)
    }.toSet

  private def stateSet(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "cnt", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("refresh folds commits; state equals full recompute; empty no-op") {
    val base = tmpDir("graft-iagg")
    val src = KeyedTable("iaggs_src", s"$base/src", Seq("id"), "id")
    val state = IncrementalAgg.stateTable("iaggs_state", s"$base/state", Seq("g"))
    val store = CheckpointStore(s"$base/cp", spark)
    val b1 = (1L to 40L).map(i => (i, s"g${i % 3}", i * 10))
    val b2 = (41L to 60L).map(i => (i, s"g${i % 3}", i * 10))

    TableOps.upsert(spark, src, b1.toDF("id", "g", "v"))
    val s1 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s1) === fullAgg(b1))

    TableOps.upsert(spark, src, b2.toDF("id", "g", "v"))
    val s2 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s2) === fullAgg(b1 ++ b2))

    // empty increment: no new commit, state unchanged, no extra state commit
    val commitsBefore = graft.tables.CommitLog(state, spark).latestCommit()
    val s3 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s3) === fullAgg(b1 ++ b2))
    assert(graft.tables.CommitLog(state, spark).latestCommit() === commitsBefore)
  }

  test("refreshDistinct: returning keys are not double-counted by the union") {
    val base = tmpDir("graft-idst")
    val src = KeyedTable("idsts_src", s"$base/src", Seq("id"), "id")
    val state = IncrementalAgg.stateTable("idsts_state", s"$base/state", Seq("g"))
    val store = CheckpointStore(s"$base/cp", spark)
    // batch 1: users 1..50; batch 2: users 26..75 — 25 RETURN. Exact
    // distinct is 75; naive cnt-addition would say 100.
    val b1 = (1L to 50L).map(i => (i, "g0", i))
    val b2 = (51L to 100L).map(i => (i, "g0", i - 25)) // user ids 26..75

    TableOps.upsert(spark, src, b1.toDF("id", "g", "u"))
    IncrementalAgg.refreshDistinct(spark, src, state, store, Seq("g"), "u")
    TableOps.upsert(spark, src, b2.toDF("id", "g", "u"))
    val fin = IncrementalAgg.refreshDistinct(spark, src, state, store,
      Seq("g"), "u")
    val (cnt, est) = fin.select("cnt", "approx_distinct")
      .as[(Long, Long)].head()
    assert(cnt === 100L) // row count still adds
    assert(math.abs(est - 75L) <= 4, s"estimate $est far from exact 75")
    // empty refresh: unchanged
    val fin2 = IncrementalAgg.refreshDistinct(spark, src, state, store,
      Seq("g"), "u")
    assert(fin2.select("cnt", "approx_distinct").as[(Long, Long)].head() ===
      ((cnt, est)))
  }

  test("crash replay: rolled-back checkpoint does not double-count") {
    val base = tmpDir("graft-iagg-replay")
    val src = KeyedTable("iaggr_src", s"$base/src", Seq("id"), "id")
    val state = IncrementalAgg.stateTable("iaggr_state", s"$base/state", Seq("g"))
    val store = CheckpointStore(s"$base/cp", spark)
    val b1 = (1L to 30L).map(i => (i, s"g${i % 2}", i))
    val b2 = (31L to 50L).map(i => (i, s"g${i % 2}", i))

    TableOps.upsert(spark, src, b1.toDF("id", "g", "v"))
    IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    val cpAfterB1 = store.get(src.name).get

    TableOps.upsert(spark, src, b2.toDF("id", "g", "v"))
    val s2 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s2) === fullAgg(b1 ++ b2))

    // simulate the crash window: state write landed, checkpoint lost —
    // roll the checkpoint back to the pre-b2 instant and refresh again
    store.put(cpAfterB1)
    val s3 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s3) === fullAgg(b1 ++ b2),
      "replayed increment was double-counted")
    // and the checkpoint re-advanced to the source head
    assert(store.get(src.name).get.lastProcessedCommit ===
      graft.tables.CommitLog(src, spark).latestCommit().get)
  }

  test("crash replay with NEW commits in the crash window stays exactly-once") {
    val base = tmpDir("graft-iagg-replay2")
    val src = KeyedTable("iaggw_src", s"$base/src", Seq("id"), "id")
    val state = IncrementalAgg.stateTable("iaggw_state", s"$base/state", Seq("g"))
    val store = CheckpointStore(s"$base/cp", spark)
    val b1 = (1L to 30L).map(i => (i, s"g${i % 2}", i))
    val b2 = (31L to 50L).map(i => (i, s"g${i % 2}", i))
    val b3 = (51L to 70L).map(i => (i, s"g${i % 2}", i))

    TableOps.upsert(spark, src, b1.toDF("id", "g", "v"))
    IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    val cpAfterB1 = store.get(src.name).get

    TableOps.upsert(spark, src, b2.toDF("id", "g", "v"))
    IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    val b2End = graft.tables.CommitLog(src, spark).latestCommit().get

    // crash window: the b2 upsert landed, the checkpoint did not — and
    // the crashed attempt's durable INTENT (end = b2's commit) is still
    // on disk. Reproduce that state, then land a NEW commit (b3) before
    // the retry. Without the intent bound, the retry would fold
    // [cpAfterB1, b3Head] under a fresh idempotency key and re-apply b2
    // (double-counting cnt/sum — the ADVICE r8 hole).
    store.put(cpAfterB1)
    store.put(Checkpoint(b2End, s"${state.name}__intent", src.path, "t"))
    TableOps.upsert(spark, src, b3.toDF("id", "g", "v"))

    // retry: replays exactly (cpAfterB1, b2End] → idempotent no-op
    val s3 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s3) === fullAgg(b1 ++ b2),
      "bounded replay re-applied already-merged commits")
    assert(store.get(src.name).get.lastProcessedCommit === b2End)
    // next refresh picks up b3 as its own increment
    val s4 = IncrementalAgg.refresh(spark, src, state, store, Seq("g"), "v")
    assert(stateSet(s4) === fullAgg(b1 ++ b2 ++ b3))
    assert(store.get(src.name).get.lastProcessedCommit ===
      graft.tables.CommitLog(src, spark).latestCommit().get)
  }
}
