package graft

import graft.ops.TableOps
import graft.tables.{KeyedTable, SecondaryIndex}
import org.apache.spark.sql.functions._

/** Secondary index (value → record keys): lookup equals the filtered
  * snapshot, stale indexes self-heal after new commits, nulls are not
  * indexed, and oversized probe sets fall back to the shuffle path.
  */
class SecondaryIndexSpec extends SparkSuite {
  import spark.implicits._

  private def mk(base: String) = {
    val t = KeyedTable("sx_t", s"$base/t", Seq("id"), "id",
      statsColumns = Seq("id"))
    val rows = (1L to 500L).map(i => (i, i % 17, s"p$i"))
      .toDF("id", "grp", "payload")
    TableOps.upsert(spark, t, rows)
    t
  }

  private def got(t: KeyedTable, probes: Seq[Long], maxProbes: Int = 10000) =
    SecondaryIndex.lookup(spark, t, "grp",
      probes.toDF("grp"), maxProbes)
      .select("id", "grp", "payload").as[(Long, Long, String)]
      .collect().toSet

  private def want(t: KeyedTable, probes: Seq[Long]) =
    TableOps.snapshot(spark, t).filter($"grp".isin(probes: _*))
      .select("id", "grp", "payload").as[(Long, Long, String)]
      .collect().toSet

  test("lookup equals filtered snapshot; empty probes; fallback path") {
    val t = mk(tmpDir("graft-sx"))
    assert(got(t, Seq(3L, 11L)) === want(t, Seq(3L, 11L)))
    assert(got(t, Seq(3L, 11L)).nonEmpty)
    // index persisted and stamped
    assert(SecondaryIndex.exists(spark, t, "grp"))
    assert(SecondaryIndex.syncedTs(spark, t, "grp").isDefined)
    // empty probe set → empty result, schema intact
    assert(got(t, Nil) === Set.empty)
    // probe set above maxProbes: the semi-join fallback returns the
    // same rows (the index is output-invisible on every path)
    assert(got(t, Seq(1L, 2L, 3L, 4L), maxProbes = 2) ===
      want(t, Seq(1L, 2L, 3L, 4L)))
    // absent value → empty
    assert(got(t, Seq(999L)) === Set.empty)
  }

  test("stale index self-heals after a new commit") {
    val t = mk(tmpDir("graft-sx2"))
    assert(got(t, Seq(5L)) === want(t, Seq(5L)))
    val stamp1 = SecondaryIndex.syncedTs(spark, t, "grp")
    // new commit MOVES key 5's group 5 → 999 and adds fresh rows
    TableOps.upsert(spark, t,
      Seq((5L, 999L, "moved"), (1001L, 999L, "new"))
        .toDF("id", "grp", "payload"))
    // no manual refresh: ensureFresh sees the commit mismatch, rebuilds
    assert(got(t, Seq(999L)) ===
      Set((5L, 999L, "moved"), (1001L, 999L, "new")))
    // ...and the old mapping is gone (key 5 no longer under grp 5)
    assert(!got(t, Seq(5L)).exists(_._1 === 5L))
    assert(SecondaryIndex.syncedTs(spark, t, "grp") !== stamp1)
  }

  test("catch-up is O(increment): appends, tolerated-stale, no rebuild") {
    val t = mk(tmpDir("graft-sx4"))
    assert(got(t, Seq(5L)) === want(t, Seq(5L))) // builds + syncs
    TableOps.upsert(spark, t,
      Seq((5L, 999L, "moved")).toDF("id", "grp", "payload"))
    assert(got(t, Seq(999L)) === Set((5L, 999L, "moved")))
    // the OLD mapping (grp 5 → key 5) must STILL be in the raw index —
    // proof the catch-up appended instead of rebuilding — while lookup
    // stays exact through the final value filter
    val raw = spark.read
      .parquet(graft.tables.SecondaryIndex.indexPath(t, "grp"))
      .select("grp", "id").as[(Long, Long)].collect().toSet
    assert(raw.contains((5L, 5L)), "stale entry compacted: increment path not used")
    assert(raw.contains((999L, 5L)))
    assert(!got(t, Seq(5L)).exists(_._1 === 5L))
    // a full refresh compacts the stale entry away
    graft.tables.SecondaryIndex.refresh(spark, t, "grp")
    val compacted = spark.read
      .parquet(graft.tables.SecondaryIndex.indexPath(t, "grp"))
      .select("grp", "id").as[(Long, Long)].collect().toSet
    assert(!compacted.contains((5L, 5L)) && compacted.contains((999L, 5L)))
  }

  test("soft delete in the increment window: paths agree with snapshot") {
    val t = mk(tmpDir("graft-sx6"))
    assert(got(t, Seq(5L)) === want(t, Seq(5L))) // builds + syncs
    // in one increment window: key 2000 arrives under grp 42, then is
    // soft-deleted. Soft-deleted rows STAY in the snapshot (the flag
    // is payload), so the increment-maintained index must answer the
    // same as a rebuilt one: the row is found
    TableOps.upsert(spark, t,
      Seq((2000L, 42L, "x")).toDF("id", "grp", "payload"))
    TableOps.softDelete(spark, t, Seq(2000L).toDF("id"))
    val incr = SecondaryIndex.lookup(spark, t, "grp", Seq(42L).toDF("grp"))
      .select("id").as[Long].collect().toSet
    assert(incr.contains(2000L),
      "increment path dropped the soft-deleted key's mapping")
    SecondaryIndex.refresh(spark, t, "grp")
    val rebuilt = SecondaryIndex.lookup(spark, t, "grp", Seq(42L).toDF("grp"))
      .select("id").as[Long].collect().toSet
    assert(incr === rebuilt)
  }

  test("restore forces a rebuild (no silent increment across it)") {
    val base = tmpDir("graft-sx5")
    val t = KeyedTable("sx_r", s"$base/t", Seq("id"), "ver")
    TableOps.upsert(spark, t,
      Seq((1L, 10L, 1), (2L, 10L, 1)).toDF("id", "grp", "ver"))
    val c1 = graft.tables.CommitLog(t, spark).latestCommit().get
    TableOps.upsert(spark, t, Seq((1L, 20L, 2)).toDF("id", "grp", "ver"))
    // index synced at head (key 1 under 20), THEN refreshed so the
    // (10, 1) mapping is compacted away — the dangerous precondition
    SecondaryIndex.refresh(spark, t, "grp")
    TableOps.restoreTo(spark, t, c1)
    // after restore, key 1's visible grp is 10 again; an increment
    // (restore has no change records) would miss it — ensureFresh must
    // detect the restore action and rebuild
    val out = SecondaryIndex.lookup(spark, t, "grp", Seq(10L).toDF("grp"))
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 2L), s"restore not re-indexed: $out")
  }

  test("null values are not indexed and never probed") {
    val base = tmpDir("graft-sx3")
    val t = KeyedTable("sx_n", s"$base/t", Seq("id"), "id")
    TableOps.upsert(spark, t,
      Seq((1L, Some(7L), "a"), (2L, None, "b"), (3L, Some(7L), "c"))
        .toDF("id", "grp", "payload"))
    val out = SecondaryIndex.lookup(spark, t, "grp", Seq(7L).toDF("grp"))
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 3L))
  }
}
