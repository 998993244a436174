package graft

import graft.ops.TableOps
import graft.tables.{Catalog, KeyedTable}

/** Persistent catalog: descriptor round-trip with every field,
  * re-registration, listing, drop, and hive-sync-style view
  * registration of current snapshots.
  */
class CatalogSpec extends SparkSuite {
  import spark.implicits._

  test("descriptors round-trip every field; list and drop work") {
    val cat = Catalog(tmpDir("graft-catalog"), spark)
    val t1 = KeyedTable("events_t", "/lake/events", Seq("id", "src"),
      "ver", Seq("day"), globalIndex = true, statsColumns = Seq("ts"))
    val t2 = KeyedTable("dim", "/lake/dim", Seq("k"), "k")
    cat.register(t1)
    cat.register(t2)
    assert(cat.list() === Seq("dim", "events_t"))
    assert(cat.load("events_t") === Some(t1))
    assert(cat.load("dim") === Some(t2))
    assert(cat.load("nope").isEmpty)
    // last-writer-wins update
    cat.register(t2.copy(path = "/lake/dim2"))
    assert(cat.load("dim").get.path === "/lake/dim2")
    assert(cat.drop("dim"))
    assert(cat.list() === Seq("events_t"))
  }

  test("syncViews registers current snapshots for SQL; resync sees new commits") {
    val base = tmpDir("graft-catalog")
    val cat = Catalog(s"$base/catalog", spark)
    val t = KeyedTable("cat_t", s"$base/cat_t", Seq("id"), "ver")
    TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver"))
    cat.register(t)
    assert(cat.syncViews() === Seq("cat_t"))
    assert(spark.sql("SELECT count(*) FROM cat_t").head.getLong(0) === 1L)
    TableOps.upsert(spark, t, Seq(("b", 1)).toDF("id", "ver"))
    cat.syncViews()
    assert(spark.sql("SELECT count(*) FROM cat_t").head.getLong(0) === 2L)
    // a fresh catalog handle (new session/job) recovers the descriptor
    val again = Catalog(s"$base/catalog", spark).load("cat_t")
    assert(again === Some(t))
  }

  test("one broken entry does not stop the other tables from syncing") {
    val base = tmpDir("graft-catalog")
    val cat = Catalog(s"$base/catalog", spark)
    val good = KeyedTable("good_t", s"$base/good_t", Seq("id"), "ver")
    TableOps.upsert(spark, good, Seq(("a", 1)).toDF("id", "ver"))
    cat.register(good)
    // registered before its first commit — snapshot() has nothing to read
    cat.register(KeyedTable("early_t", s"$base/early_t", Seq("id"), "ver"))
    assert(cat.syncViews() === Seq("good_t"))
    assert(spark.sql("SELECT count(*) FROM good_t").head.getLong(0) === 1L)
  }

  test("illegal names and unparseable entries are rejected, not propagated") {
    val root = tmpDir("graft-catalog")
    val cat = Catalog(root, spark)
    intercept[IllegalArgumentException] { cat.load("../escape") }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "broken.json"),
      "{not json".getBytes)
    assert(cat.load("broken").isEmpty)
    assert(cat.list() === Seq("broken")) // listed, load-time skipped
  }
}
