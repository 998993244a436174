package graft

import graft.ops.TableOps
import graft.sources.S3Conf
import graft.tables.{KeyIndex, KeyedTable}

/** Object-store deployment parity (the reference runs entirely on
  * s3a://MinIO): the engine's full table lifecycle must work under a
  * filesystem that REFUSES atomic directory renames, and the S3 session
  * conf helper must reproduce the reference's Hadoop settings.
  */
class ObjectStoreSpec extends SparkSuite {
  import spark.implicits._

  private def rows(rs: (String, Int, String, String)*) =
    rs.toDF("id", "ver", "payload", "part")

  test("full table lifecycle under object-store rename semantics") {
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[TrackingLocalFs].getName)
    TrackingLocalFs.reset()
    val base = tmpDir("graft-objstore")
    val t = KeyedTable("os", s"graftfs:$base/os", Seq("id"), "ver",
      Seq("part"), globalIndex = true)
    // insert → global key move (index probe + bucket swap) → delete →
    // compact → clean: every commit primitive the engine has
    val ts1 = TableOps.upsert(spark, t,
      rows(("a", 1, "x", "p1"), ("b", 1, "y", "p2")))
    assert(ts1.nonEmpty)
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p2")))
    assert(TableOps.snapshot(spark, t)
      .select("id", "ver", "part").as[(String, Int, String)].collect().toSet
      === Set(("a", 2, "p2"), ("b", 1, "p2")),
      "global move must merge under the shim FS")
    assert(KeyIndex.lookupPartitions(spark, t, Seq("a").toDF("id"))
      .as[String].collect().toSeq === Seq("p2"))
    TableOps.delete(spark, t, Seq("b").toDF("id"))
    TableOps.compact(spark, t)
    TableOps.clean(spark, t, retainCommits = 2)
    assert(TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet
      === Set(("a", 2)))
    // the engine itself never renamed a directory — only the Spark task
    // committer's _temporary mechanics did (replaced by S3A committers
    // in production S3 deployments)
    assert(TrackingLocalFs.engineDirRenames.isEmpty,
      s"engine must not dir-rename: ${TrackingLocalFs.engineDirRenames}")
  }

  test("bootstrap adopts in place under object-store rename semantics") {
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[TrackingLocalFs].getName)
    TrackingLocalFs.reset()
    val base = tmpDir("graft-objstore-bs")
    val src = s"graftfs:$base/src"
    rows(("a", 1, "x", "p1"), ("b", 2, "y", "p2"))
      .write.partitionBy("part").parquet(src)
    TrackingLocalFs.reset() // drop the committer noise from the seed write
    val t = KeyedTable("osbs", s"graftfs:$base/osbs", Seq("id"), "ver",
      Seq("part"))
    val ts = TableOps.bootstrap(spark, t, src)
    assert(ts.nonEmpty)
    assert(TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet ===
      Set(("a", 1), ("b", 2)))
    // lifecycle on top of the adopted state: COW migrate one adopted
    // partition, then retention-clean — all still rename-free
    TableOps.upsert(spark, t, rows(("a", 2, "x2", "p1")))
    TableOps.clean(spark, t, retainCommits = 1)
    assert(TableOps.snapshot(spark, t)
      .select("id", "ver").as[(String, Int)].collect().toSet ===
      Set(("a", 2), ("b", 2)))
    // the adopted source files are never moved OR deleted — the engine
    // does not destroy data it didn't write
    assert(spark.read.parquet(src).count() === 2)
    // column surgery on top of the adopted state: rename must stay
    // metadata-only and the mapped read must still resolve both the
    // adopted files (physical old name) and the rewritten partition
    TableOps.renameColumn(spark, t, "payload", "body")
    assert(TableOps.snapshot(spark, t)
      .select("id", "body").as[(String, String)].collect().toSet ===
      Set(("a", "x2"), ("b", "y")))
    assert(TrackingLocalFs.engineDirRenames.isEmpty,
      s"bootstrap must not dir-rename: ${TrackingLocalFs.engineDirRenames}")
  }

  test("S3Conf reproduces the reference's MinIO session configuration") {
    S3Conf(spark, "http://minio:9000", "ak", "sk")
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.endpoint") === "http://minio:9000")
    assert(c.get("fs.s3a.access.key") === "ak")
    assert(c.get("fs.s3a.secret.key") === "sk")
    assert(c.get("fs.s3a.path.style.access") === "true")
    assert(c.get("fs.s3a.connection.ssl.enabled") === "false")
    assert(c.get("fs.s3a.impl") === "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(c.get("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
    // env-driven variant (reference deployment shape)
    assert(S3Conf.fromEnv(spark, Map(
      "MINIO_ENDPOINT" -> "http://m:9", "MINIO_ACCESS_KEY" -> "a",
      "MINIO_SECRET_KEY" -> "s")))
    assert(c.get("fs.s3a.endpoint") === "http://m:9")
    assert(!S3Conf.fromEnv(spark, Map.empty))
  }
}
