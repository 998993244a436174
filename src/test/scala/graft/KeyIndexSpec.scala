package graft

import graft.ops.TableOps
import graft.tables.{KeyIndex, KeyedTable}
import org.apache.hadoop.fs.Path

/** Partition-scoped vs GLOBAL upsert key matching (VERDICT r1 #2/#3):
  * the default never scans beyond the increment's partitions; GLOBAL
  * discovers moved keys via the persisted bucketed key index, also
  * without a table scan. "Never reads" is proven the hard way — other
  * partitions' files are corrupted on disk, so any accidental read
  * fails the job.
  */
class KeyIndexSpec extends SparkSuite {
  import spark.implicits._

  private def fsOf(t: KeyedTable) =
    new Path(t.path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Overwrite every data file of the partition with junk so any read
    * throws (current dir resolved via the manifest parts map).
    */
  private def corrupt(t: KeyedTable, rel: String): Unit = {
    val fs = fsOf(t)
    fs.listStatus(new Path(TableOps.partitionDirs(spark, t)(rel)))
      .filter(_.isFile)
      .foreach { st =>
        val out = fs.create(st.getPath, true)
        try out.write("not a parquet file".getBytes)
        finally out.close()
      }
  }

  private def rows(rs: (String, Int, String, String)*) =
    rs.toDF("id", "ver", "payload", "part")

  test("partition-scoped default: key re-written under a new partition coexists") {
    val base = tmpDir("graft-psc")
    val t = KeyedTable("ps", s"$base/ps", Seq("id"), "ver", Seq("part"))
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    // same key, different partition: default matching is per-partition,
    // so the old row in p1 stays (Hudi BLOOM default)
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2")))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
    assert(snap === Set(("a", 1, "p1"), ("a", 2, "p2"), ("b", 1, "p2")))
  }

  test("partition-scoped upsert never reads untouched partitions") {
    val base = tmpDir("graft-noscan")
    val t = KeyedTable("ns", s"$base/ns", Seq("id"), "ver", Seq("part"))
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p3")))
    corrupt(t, "part=p2")
    corrupt(t, "part=p3")
    // merging into p1 must succeed even though p2/p3 are unreadable
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1"), ("d", 1, "w", "p1")))
    val p1 = TableOps.snapshot(spark, t).filter($"part" === "p1")
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(p1 === Set(("a", 2), ("d", 1)))
  }

  test("GLOBAL upsert discovers moved keys via the index, not a table scan") {
    val base = tmpDir("graft-gscan")
    val t = KeyedTable("gs", s"$base/gs", Seq("id"), "ver", Seq("part"),
      globalIndex = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p3")))
    assert(KeyIndex.exists(spark, t))
    corrupt(t, "part=p3") // untouched by the move below; must never be read
    // 'a' moves p1 → p2: old-home discovery must come from the index
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2")))
    val snap = TableOps.snapshot(spark, t).filter($"part" =!= "p3")
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
    assert(snap === Set(("a", 2, "p2"), ("b", 1, "p2")))
  }

  test("GLOBAL index bootstraps from the snapshot for a pre-index table") {
    val base = tmpDir("graft-boot")
    val legacy = KeyedTable("bt", s"$base/bt", Seq("id"), "ver", Seq("part"))
    TableOps.upsert(spark, legacy, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    assert(!KeyIndex.exists(spark, legacy))
    val t = legacy.copy(globalIndex = true)
    // first GLOBAL upsert bootstraps, then the move is index-served
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2")))
    assert(KeyIndex.exists(spark, t))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
    assert(snap === Set(("a", 2, "p2"), ("b", 1, "p2")))
  }

  test("GLOBAL delete prunes via the index and removes deleted keys from it") {
    val base = tmpDir("graft-gdel")
    val t = KeyedTable("gd", s"$base/gd", Seq("id"), "ver", Seq("part"),
      globalIndex = true)
    TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2"), ("c", 1, "z", "p3")))
    corrupt(t, "part=p3") // 'a'/'b' don't live there; delete must not read it
    TableOps.delete(spark, t, Seq("a", "b").toDF("id"))
    assert(TableOps.snapshot(spark, t).filter($"part" =!= "p3").count() === 0)
    // deleted keys are gone from the index; surviving key still resolves
    assert(KeyIndex.lookupPartitions(spark, t, Seq("a", "b").toDF("id"))
      .count() === 0)
    assert(KeyIndex.lookupPartitions(spark, t, Seq("c").toDF("id"))
      .as[String].collect().toSeq === Seq("p3"))
  }

  test("multi-column partitioning: struct-IN predicate targets exact tuples") {
    val base = tmpDir("graft-mcol")
    val t = KeyedTable("mc", s"$base/mc", Seq("id"), "ver",
      Seq("region", "day"))
    def r2(rs: (String, Int, String, String)*) =
      rs.toDF("id", "ver", "region", "day")
    TableOps.upsert(spark, t,
      r2(("a", 1, "eu", "d1"), ("b", 1, "eu", "d2"), ("c", 1, "us", "d1")))
    // (eu,d2) and (us,d1) must never be read — only (eu,d1) is incoming
    corrupt(t, "region=eu/day=d2")
    corrupt(t, "region=us/day=d1")
    TableOps.upsert(spark, t, r2(("a", 2, "eu", "d1")))
    val eu1 = TableOps.snapshot(spark, t)
      .filter($"region" === "eu" && $"day" === "d1")
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(eu1 === Set(("a", 2)))
  }

  test("GLOBAL index self-heals from a stale sync stamp (simulated crash)") {
    val base = tmpDir("graft-heal")
    val t = KeyedTable("hl", s"$base/hl", Seq("id"), "ver", Seq("part"),
      globalIndex = true)
    TableOps.upsert(spark, t, rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    // simulate a writer that crashed between manifest publish and index
    // update: move 'a' p1→p2, then FORGE the index back to the stale
    // state (old mapping + old sync stamp)
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2")))
    val fs = fsOf(t)
    val idx = new Path(s"${t.path}/.commits/index")
    fs.delete(idx, true) // index lost entirely == arbitrarily stale
    // next GLOBAL write must rebuild (ensureFresh) and still be correct:
    // move 'a' p2→p3 — the stale-free index must point at p2
    TableOps.upsert(spark, t, rows(("a", 3, "x3", "p3")))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
    assert(snap === Set(("a", 3, "p3"), ("b", 1, "p2")),
      "no stale duplicate of the moved key may survive")
    assert(graft.tables.KeyIndex.syncedTs(spark, t).nonEmpty)
  }

  test("GLOBAL uniqueness survives a key batch arriving WIDER than the indexed type") {
    val base = tmpDir("graft-widekey")
    val t = KeyedTable("wk", s"$base/wk", Seq("id"), "ver", Seq("part"),
      globalIndex = true)
    // batch 1 writes the key as INT
    TableOps.upsert(spark, t, Seq((5, 1, "p1"), (7, 1, "p1"))
      .toDF("id", "ver", "part"))
    // batch 2 moves the same LOGICAL key, arriving as LONG (the widening
    // the merge plan supports): the index probe must hash to the same
    // bucket the int write used, find p1, and evict the old home —
    // physical-type hashing would probe the wrong bucket and leave a
    // silent duplicate of key 5 in p1
    TableOps.upsert(spark, t, Seq((5L, 2, "p2")).toDF("id", "ver", "part"))
    val snap = TableOps.snapshot(spark, t)
      .select($"id".cast("long"), $"ver", $"part")
      .as[(Long, Int, String)].collect().toSet
    assert(snap === Set((5L, 2, "p2"), (7L, 1, "p1")),
      "exactly one row per logical key — GLOBAL uniqueness")
  }

  test("null partition values: predicate matches the hive default partition") {
    val base = tmpDir("graft-nullpart")
    val t = KeyedTable("np2", s"$base/np2", Seq("id"), "ver",
      Seq("region", "day"))
    def r(rs: (String, Int, String, Integer)*) =
      rs.toDF("id", "ver", "region", "day")
    TableOps.upsert(spark, t,
      r(("a", 1, "eu", null), ("b", 1, "eu", 1), ("c", 1, "us", 2)))
    // second upsert into the null-day partition must MERGE (update 'a'),
    // not duplicate it — the struct-IN predicate alone would drop
    // null-tuples via three-valued logic
    TableOps.upsert(spark, t, r(("a", 2, "eu", null)))
    val snap = TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet
    assert(snap === Set(("a", 2), ("b", 1), ("c", 1)))
  }

  test("wide upsert: hundreds of partitions plan via a single IN predicate") {
    val base = tmpDir("graft-wide")
    val t = KeyedTable("wd", s"$base/wd", Seq("id"), "ver", Seq("part"))
    val first = (1 to 300).map(i => (s"k$i", 1, "v", s"p${i % 150}"))
    TableOps.upsert(spark, t, first.toDF("id", "ver", "payload", "part"))
    val second = (1 to 300).map(i => (s"k$i", 2, "v2", s"p${i % 150}"))
    TableOps.upsert(spark, t, second.toDF("id", "ver", "payload", "part"))
    val snap = TableOps.snapshot(spark, t)
    assert(snap.count() === 300)
    assert(snap.filter($"ver" === 2).count() === 300)
  }
}
