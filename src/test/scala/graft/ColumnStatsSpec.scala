package graft

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._

/** Column-stats file-skipping index: sidecar collection at every write
  * path, predicate-pruned reads (correct AND strictly fewer files),
  * conservative fallbacks (legacy commits, untracked columns,
  * untranslatable predicates), null semantics.
  */
class ColumnStatsSpec extends SparkSuite {
  import spark.implicits._

  private def statsTable(partitioned: Boolean) = {
    val base = tmpDir("graft-stats")
    KeyedTable("t", s"$base/t", Seq("id"), "ver",
      if (partitioned) Seq("part") else Nil,
      statsColumns = Seq("v"))
  }

  /** 0..199 with v == id, clustered by v into ~8 files so ranges are
    * disjoint and a range predicate isolates a strict file subset.
    */
  private def seed(t: KeyedTable, n: Int = 200): Unit = {
    val df = spark.range(n).select(
      concat(lit("k"), col("id")).as("id"),
      lit(1).as("ver"),
      col("id").cast("long").as("v"),
      (col("id") % 2).cast("string").as("part"))
    TableOps.upsert(spark, t, df, sortBy = Seq("v"), maxRecordsPerFile = 25L)
  }

  test("range predicate prunes files and matches unpruned filter") {
    val t = statsTable(partitioned = false)
    seed(t)
    val pred = col("v") >= 150L && col("v") < 160L
    val pruned = TableOps.snapshotWhere(spark, t, pred)
    val full = TableOps.snapshot(spark, t)
    assert(pruned.select("id", "v").orderBy("v").collect().toSeq ===
      full.filter(pred).select("id", "v").orderBy("v").collect().toSeq)
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"expected pruning: ${pruned.inputFiles.length} vs ${full.inputFiles.length}")
    assert(pruned.count() === 10)
  }

  test("partitioned table: pruning respects live-partition ownership across commits") {
    val t = statsTable(partitioned = true)
    seed(t)
    // second commit rewrites only part=0 (even v) — part=1 stays owned
    // by commit 1; stats from BOTH sidecars must cooperate
    val upd = spark.range(10).select(
      concat(lit("k"), col("id") * 2).as("id"),
      lit(2).as("ver"),
      (col("id") * 2).cast("long").as("v"),
      lit("0").as("part"))
    TableOps.upsert(spark, t, upd, sortBy = Seq("v"), maxRecordsPerFile = 25L)
    val pred = col("v") >= 180L
    val pruned = TableOps.snapshotWhere(spark, t, pred)
    val expected = TableOps.snapshot(spark, t).filter(pred)
    assert(pruned.select("id", "v", "ver").orderBy("v").collect().toSeq ===
      expected.select("id", "v", "ver").orderBy("v").collect().toSeq)
    assert(pruned.inputFiles.length < TableOps.snapshot(spark, t).inputFiles.length)
  }

  test("equality, IN, and boolean combinations prune; results exact") {
    val t = statsTable(partitioned = false)
    seed(t)
    val full = TableOps.snapshot(spark, t)
    for (pred <- Seq(
        col("v") === 42L,
        col("v").isin(3L, 44L, 199L),
        col("v") < 10L || col("v") >= 190L,
        lit(50L) > col("v") && col("v") >= 40L)) {
      val pruned = TableOps.snapshotWhere(spark, t, pred)
      assert(pruned.select("v").orderBy("v").as[Long].collect().toSeq ===
        full.filter(pred).select("v").orderBy("v").as[Long].collect().toSeq)
      assert(pruned.inputFiles.length < full.inputFiles.length)
    }
  }

  test("a multi-thousand-value IN translates at constant depth") {
    // regression: the stats translation used to build an OR chain one
    // Column level deep per IN-list value — a ~1500-key index lookup
    // overflowed the converter stack at sf0.1. The array+exists form
    // must both survive a wide list and still prune.
    val t = statsTable(partitioned = false)
    seed(t)
    val full = TableOps.snapshot(spark, t)
    val vals = (0L until 3000L).map(_ + 10000L) :+ 42L // one real hit
    val pred = col("v").isin(vals: _*)
    val pruned = TableOps.snapshotWhere(spark, t, pred)
    assert(pruned.select("v").as[Long].collect().toSeq === Seq(42L))
    assert(pruned.inputFiles.length < full.inputFiles.length)
  }

  test("every file pruned returns an empty frame with the table schema") {
    val t = statsTable(partitioned = false)
    seed(t)
    val res = TableOps.snapshotWhere(spark, t, col("v") > 10000L)
    assert(res.count() === 0)
    assert(res.columns.toSet ===
      TableOps.snapshot(spark, t).columns.toSet)
  }

  test("null-aware predicates: IS NULL keeps only null-carrying files") {
    val base = tmpDir("graft-stats")
    val t = KeyedTable("t", s"$base/t", Seq("id"), "ver",
      statsColumns = Seq("v"))
    // 4 files: ids 0..99 clustered by id; v null only for id < 25
    val df = spark.range(100).select(
      concat(lit("k"), col("id")).as("id"),
      lit(1).as("ver"),
      col("id").cast("long").as("ord"),
      when(col("id") < 25, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))
    val t2 = t.copy(statsColumns = Seq("v", "ord"))
    TableOps.upsert(spark, t2, df, sortBy = Seq("ord"), maxRecordsPerFile = 25L)
    val full = TableOps.snapshot(spark, t2)
    val isNull = TableOps.snapshotWhere(spark, t2, col("v").isNull)
    assert(isNull.count() === 25)
    assert(isNull.inputFiles.length < full.inputFiles.length)
    val notNull = TableOps.snapshotWhere(spark, t2, col("v").isNotNull)
    assert(notNull.count() === 75)
    // comparison against the all-null file: its null min/max must prune
    val cmp = TableOps.snapshotWhere(spark, t2, col("v") < 30L)
    assert(cmp.count() === 5)
    assert(cmp.inputFiles.length < full.inputFiles.length)
  }

  test("untracked columns and untranslatable predicates fall back, stay correct") {
    val t = statsTable(partitioned = false)
    seed(t)
    val full = TableOps.snapshot(spark, t)
    // untracked column — no pruning, correct result
    val byId = TableOps.snapshotWhere(spark, t, col("id") === "k7")
    assert(byId.count() === 1)
    assert(byId.inputFiles.length === full.inputFiles.length)
    // untranslatable node (arithmetic) — conservative, correct
    val arith = TableOps.snapshotWhere(spark, t, col("v") + 1L === 8L)
    assert(arith.select("v").as[Long].collect().toSeq === Seq(7L))
  }

  test("table without statsColumns behaves exactly like snapshot().filter") {
    val base = tmpDir("graft-stats")
    val t = KeyedTable("t", s"$base/t", Seq("id"), "ver")
    TableOps.upsert(spark, t,
      Seq(("a", 1, 5L), ("b", 1, 9L)).toDF("id", "ver", "v"))
    val res = TableOps.snapshotWhere(spark, t, col("v") > 6L)
    assert(res.select("id").as[String].collect().toSeq === Seq("b"))
  }

  test("legacy commit without a sidecar is read in full; later commits still prune") {
    val t = statsTable(partitioned = false)
    // first commit written WITHOUT statsColumns (legacy)
    val legacy = t.copy(statsColumns = Nil)
    TableOps.upsert(spark, legacy, Seq(("a", 1, 5L)).toDF("id", "ver", "v"))
    // sidecar missing while the legacy dir is LIVE: full read, correct
    assert(TableOps.snapshotWhere(spark, t, col("v") > 1L).count() === 1)
    // second commit with stats (rewrites the whole unpartitioned table)
    seed(t, n = 50)
    val pred = col("v") >= 40L
    val res = TableOps.snapshotWhere(spark, t, pred)
    assert(res.count() ===
      TableOps.snapshot(spark, t).filter(pred).count())
  }

  test("incremental read prunes untouched files via always-tracked _commit_ts stats") {
    val t = statsTable(partitioned = true)
    seed(t) // commit 1: part=0 and part=1
    val ts1 = graft.tables.CommitLog(t, spark).latestCommit().get
    // commit 2 touches ONLY part=0 — part=1's files keep max
    // _commit_ts = ts1 and must be pruned from metadata
    val upd = spark.range(5).select(
      concat(lit("k"), col("id") * 2).as("id"), lit(2).as("ver"),
      (col("id") * 2).cast("long").as("v"), lit("0").as("part"))
    TableOps.upsert(spark, t, upd, sortBy = Seq("v"), maxRecordsPerFile = 25L)
    val inc = TableOps.incremental(spark, t, ts1)
    val full = TableOps.snapshot(spark, t)
    assert(inc.select("id", "v").orderBy("v").collect().toSeq ===
      full.filter(col(graft.tables.KeyedTable.CommitCol) > ts1)
        .select("id", "v").orderBy("v").collect().toSeq)
    assert(inc.count() === 5)
    assert(inc.inputFiles.length < full.inputFiles.length,
      s"expected commit-ts pruning: ${inc.inputFiles.length} vs ${full.inputFiles.length}")
  }

  test("partition-column predicates prune without declaration") {
    val t = statsTable(partitioned = true)
    seed(t)
    val full = TableOps.snapshot(spark, t)
    val res = TableOps.snapshotWhere(spark, t, col("part") === "1")
    assert(res.count() === 100)
    assert(res.inputFiles.length < full.inputFiles.length)
  }

  test("countFast answers from metadata and tracks upsert/delete/compact") {
    val t = statsTable(partitioned = true)
    seed(t)
    assert(TableOps.countFast(spark, t) === 200L)
    // upsert: 5 updates (no growth) + implicit new rows? — pure updates
    val upd = spark.range(5).select(
      concat(lit("k"), col("id") * 2).as("id"), lit(2).as("ver"),
      (col("id") * 2).cast("long").as("v"), lit("0").as("part"))
    TableOps.upsert(spark, t, upd)
    assert(TableOps.countFast(spark, t) === 200L)
    TableOps.delete(spark, t, Seq(("k1")).toDF("id"))
    assert(TableOps.countFast(spark, t) === 199L)
    TableOps.compact(spark, t)
    assert(TableOps.countFast(spark, t) === 199L)
    assert(TableOps.countFast(spark, t) ===
      TableOps.snapshot(spark, t).count())
    // a table without sidecars still answers (scan fallback)
    val plain = KeyedTable("p", s"${tmpDir("graft-cf")}/p", Seq("id"), "ver")
    TableOps.upsert(spark, plain, Seq(("a", 1)).toDF("id", "ver"))
    assert(TableOps.countFast(spark, plain) === 1L)
  }

  test("a missing live dir fails loud, never a silent undercount or partial read") {
    val t = statsTable(partitioned = true)
    seed(t)
    // simulate out-of-band loss of a LIVE partition dir
    val dirs = TableOps.partitionDirs(spark, t)
    val victim = java.nio.file.Paths.get(
      new java.net.URI(dirs("part=1")).getPath match {
        case p if p.nonEmpty => p
        case _ => dirs("part=1")
      })
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    deleteRec(victim)
    intercept[java.io.FileNotFoundException] {
      TableOps.countFast(spark, t)
    }
    intercept[java.io.FileNotFoundException] {
      TableOps.snapshotWhere(spark, t, col("v") >= 0L).collect()
    }
  }

  test("stats survive compaction and delete rewrites") {
    val t = statsTable(partitioned = false)
    seed(t)
    TableOps.compact(spark, t, sortBy = Seq("v"), maxRecordsPerFile = 25L)
    val full = TableOps.snapshot(spark, t)
    val pred = col("v") >= 150L && col("v") < 160L
    val afterCompact = TableOps.snapshotWhere(spark, t, pred)
    assert(afterCompact.count() === 10)
    assert(afterCompact.inputFiles.length < full.inputFiles.length)
    TableOps.delete(spark, t, Seq("k155").toDF("id"))
    val afterDelete = TableOps.snapshotWhere(spark, t, pred)
    assert(afterDelete.count() === 9)
  }

  test("statsView: live files only, roles tagged, sums to the table") {
    val t = statsTable(partitioned = true)
    seed(t)
    // rewrite part=0 — the view must DROP commit 1's part=0 stats rows
    val upd = spark.range(10).select(
      concat(lit("k"), col("id") * 2).as("id"),
      lit(2).as("ver"),
      (col("id") * 2).cast("long").as("v"),
      lit("0").as("part"))
    TableOps.upsert(spark, t, upd, sortBy = Seq("v"), maxRecordsPerFile = 25L)
    val sv = TableOps.statsView(spark, t)
    assert(sv.columns.toSet.intersect(
      Set("file", "rows", "min_v", "max_v", "commit_ts", "role")).size === 6)
    // sidecar row sums == exact live table count, per role
    assert(sv.agg(sum("rows")).as[Long].head() ===
      TableOps.snapshot(spark, t).count())
    assert(sv.select("role").distinct().as[String].collect().toSet
      === Set("base"))
    // commit 1 contributes ONLY its still-owned partition (odd v):
    // every commit-1 stats row must sit inside the odd-v range
    val firstTs = sv.select("commit_ts").as[String].collect().min
    val c1 = sv.filter($"commit_ts" === firstTs)
    assert(c1.filter($"min_v" % 2 === 0).count() === 0)
    // a MOR delta commit appears with role=delta and its own rows
    TableOps.deltaCommit(spark, t, spark.range(5).select(
      concat(lit("kd"), col("id")).as("id"), lit(3).as("ver"),
      (col("id") + 1000L).as("v"), lit("1").as("part")))
    val sv2 = TableOps.statsView(spark, t)
    val delta = sv2.filter($"role" === "delta")
    assert(delta.agg(sum("rows")).as[Long].head() === 5L)
    assert(delta.agg(min("min_v")).as[Long].head() === 1000L)
  }
}
