package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.functions._

/** Metadata-only bootstrap ([[TableOps.bootstrap]], the Hudi
  * `bootstrap` METADATA_ONLY surface): adoption BY REFERENCE (the
  * source files stay in place — no rename, no copy; object-store
  * safe), the null-commit-stamp merge semantics, incremental/CDC
  * visibility, and the refusal guards.
  */
class BootstrapSpec extends SparkSuite {
  import spark.implicits._

  private def freshBase = tmpDir("graft-bootstrap")

  private def writeSrc(base: String, partitioned: Boolean): String = {
    val src = s"$base/src"
    val df = Seq(("a", 1, "x", "p1"), ("b", 2, "y", "p2"),
      ("c", 1, "z", "p1")).toDF("id", "ver", "payload", "part")
    if (partitioned) df.write.partitionBy("part").parquet(src)
    else df.write.parquet(src)
    src
  }

  test("bootstrap: snapshot roundtrip with null commit stamps; no data copied") {
    val base = freshBase
    val src = writeSrc(base, partitioned = false)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcFiles = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver")
    val ts = TableOps.bootstrap(spark, t, src)
    // adoption by reference: the source keeps EXACTLY its files in
    // place (no rename/copy) and no commit dir materializes
    val afterFiles = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    assert(afterFiles === srcFiles)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t.dataPath}/$ts")))
    assert(TableOps.partitionDirs(spark, t)("") ===
      fs.makeQualified(new org.apache.hadoop.fs.Path(src)).toString)
    assert(CommitLog(t, spark).externalRoots().keySet === Set(ts))
    val snap = TableOps.snapshot(spark, t)
    assert(snap.select("id", "ver", "payload")
      .as[(String, Int, String)].collect().toSet ===
      Set(("a", 1, "x"), ("b", 2, "y"), ("c", 1, "z")))
    assert(snap.filter(col(KeyedTable.CommitCol).isNotNull).count() === 0)
    assert(CommitLog(t, spark).commitMeta(ts)
      .exists(_.get("action").contains("bootstrap")))
  }

  test("bootstrap rows lose precombine TIES to stamped writes, win on greater ver") {
    val base = freshBase
    val src = writeSrc(base, partitioned = false)
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver")
    TableOps.bootstrap(spark, t, src)
    // a: tie on ver=1 → stamped incoming wins; b: stale ver=1 vs
    // bootstrapped ver=2 → bootstrapped survives
    TableOps.upsert(spark, t,
      Seq(("a", 1, "x-new", "p1"), ("b", 1, "y-stale", "p2"))
        .toDF("id", "ver", "payload", "part"))
    assert(TableOps.snapshot(spark, t).select("id", "payload")
      .as[(String, String)].collect().toSet ===
      Set(("a", "x-new"), ("b", "y"), ("c", "z")))
  }

  test("bootstrap commit is invisible to incremental and CDC reads") {
    val base = freshBase
    val src = writeSrc(base, partitioned = false)
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver")
    val ts = TableOps.bootstrap(spark, t, src)
    assert(TableOps.incremental(spark, t, beginExclusive = ts).isEmpty)
    assert(TableOps.changeLog(spark, t, beginExclusive = "0").isEmpty)
    TableOps.upsert(spark, t,
      Seq(("d", 1, "w", "p1")).toDF("id", "ver", "payload", "part"))
    assert(TableOps.incremental(spark, t, beginExclusive = ts)
      .select("id").as[String].collect().toSeq === Seq("d"))
  }

  test("partitioned bootstrap: hive dirs adopted; later rewrite partition-scoped") {
    val base = freshBase
    val src = writeSrc(base, partitioned = true)
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver",
      partitionBy = Seq("part"))
    val ts = TableOps.bootstrap(spark, t, src)
    assert(TableOps.partitionDirs(spark, t).keySet ===
      Set("part=p1", "part=p2"))
    TableOps.upsert(spark, t,
      Seq(("a", 3, "x3", "p1")).toDF("id", "ver", "payload", "part"))
    // p2 still owned by the bootstrap commit — resolved to the
    // in-place source dir; p1 migrated into a real commit dir
    val dirs = TableOps.partitionDirs(spark, t)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcQ = fs.makeQualified(new org.apache.hadoop.fs.Path(src)).toString
    assert(dirs("part=p2") === s"$srcQ/part=p2")
    assert(fs.makeQualified(new org.apache.hadoop.fs.Path(dirs("part=p1")))
      .toString.startsWith(
        fs.makeQualified(new org.apache.hadoop.fs.Path(t.dataPath)).toString))
    assert(!dirs("part=p1").contains(s"/$ts/"))
    assert(TableOps.snapshot(spark, t).select("id", "payload")
      .as[(String, String)].collect().toSet ===
      Set(("a", "x3"), ("b", "y"), ("c", "z")))
  }

  test("bootstrap refusals: existing table, graft data, stats tables, bad columns") {
    val base = freshBase
    val src = writeSrc(base, partitioned = false)
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver")
    TableOps.upsert(spark, t,
      Seq(("z", 1, "q", "p9")).toDF("id", "ver", "payload", "part"))
    intercept[IllegalArgumentException] {
      TableOps.bootstrap(spark, t, src) // table exists
    }
    val t2 = KeyedTable("bs2", s"$base/bs2", Seq("id"), "ver",
      statsColumns = Seq("id"))
    intercept[IllegalArgumentException] {
      TableOps.bootstrap(spark, t2, src) // stats table
    }
    val t3 = KeyedTable("bs3", s"$base/bs3", Seq("missing_col"), "ver")
    intercept[IllegalArgumentException] {
      TableOps.bootstrap(spark, t3, src) // key column absent
    }
    // source still untouched after every refusal (rename never ran)
    assert(spark.read.parquet(src).count() === 3)
  }

  test("bootstrap refuses an ANCESTOR of the table root (aliasing both ways)") {
    val base = freshBase
    writeSrc(s"$base/anc", partitioned = false)
    // table root nested INSIDE the would-be adopted source: later
    // commit dirs under data/ would prefix-match the external root and
    // be misattributed to the bootstrap ver in backingRels
    val t = KeyedTable("bs", s"$base/anc/src/bs", Seq("id"), "ver")
    val ex = intercept[IllegalArgumentException] {
      TableOps.bootstrap(spark, t, s"$base/anc/src")
    }
    assert(ex.getMessage.contains("lies inside bootstrap source"))
  }

  test("corrupt external_roots.json fails LOUD, not silent-empty") {
    val base = freshBase
    val src = writeSrc(base, partitioned = false)
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver")
    TableOps.bootstrap(spark, t, src)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootsFile = new org.apache.hadoop.fs.Path(
      s"${t.commitsPath}/external_roots.json")
    assert(fs.exists(rootsFile))
    val out = fs.create(rootsFile, true)
    out.write("{not json".getBytes("UTF-8")); out.close()
    // a silently-empty roots map would degrade the adopted commit to
    // "cleaned"/path-not-found; the contract is to refuse the read
    val ex = intercept[IllegalStateException] {
      TableOps.snapshot(spark, t).count()
    }
    assert(ex.getMessage.contains("unparseable"))
  }

  test("CDC/stream feeds SKIP the adopted corpus, not scan-and-discard it") {
    val base = freshBase
    val src = writeSrc(base, partitioned = false)
    val t = KeyedTable("bs", s"$base/bs", Seq("id"), "ver")
    TableOps.bootstrap(spark, t, src)
    TableOps.upsert(spark, t,
      Seq(("d", 1, "w", "p1")).toDF("id", "ver", "payload", "part"))
    // plant a non-parquet file in the adopted root: a feed that still
    // SCANS the adopted ver (to filter every row out) crashes on it; a
    // feed that skips the ver by contract never opens the dir
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = new org.apache.hadoop.fs.Path(s"$src/junk.parquet")
    val out = fs.create(junk); out.write("not parquet".getBytes); out.close()
    try {
      val changes = TableOps.changeLog(spark, t, beginExclusive = "")
      assert(changes.select("id").as[String].collect().toSeq === Seq("d"))
    } finally fs.delete(junk, false)
  }
}
