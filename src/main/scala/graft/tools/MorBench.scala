package graft.tools

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off measurement backing the SCALE.md "MERGE_ON_READ writes" row:
  * ingest the same keyed update micro-batches into identical
  * partitioned tables via COW `upsert` vs MOR `deltaCommit` (+ one
  * final fold), and report wall seconds and bytes written under
  * `data/`. Deliberately NOT part of the driver bench set (scratch-dir
  * lifecycle measures tmpfs writes, not operator throughput) — run
  * manually:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.MorBench"
  * }}}
  */
object MorBench {

  private def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // orders partitioned by order month (~12+ dirs) — every batch
    // grazes most partitions, the COW worst case MOR exists for
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("omonth", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("ver", lit(0))
    val nBatches = 16
    def batch(i: Int): DataFrame = orders
      .filter(pmod(col("o_orderkey"), lit(100)) === lit(i * 3))
      .withColumn("ver", lit(i + 1))
      .withColumn("o_totalprice", col("o_totalprice") + i)

    val root = java.nio.file.Files.createTempDirectory("graft-morbench")
    def mkTable(name: String) = KeyedTable(name, s"$root/$name",
      Seq("o_orderkey"), "ver", Seq("omonth"))

    def timed[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val cow = mkTable("cow")
    val cowSeed = timed(TableOps.upsert(spark, cow, orders))
    val cowIngest = timed {
      (0 until nBatches).foreach(i => TableOps.upsert(spark, cow, batch(i)))
    }
    val cowBytes = dirBytes(spark, cow.dataPath)

    val mor = mkTable("mor")
    val morSeed = timed(TableOps.upsert(spark, mor, orders))
    val morIngest = timed {
      (0 until nBatches).foreach(i => TableOps.deltaCommit(spark, mor, batch(i)))
    }
    val morFold = timed(TableOps.compactDeltas(spark, mor))
    val morBytes = dirBytes(spark, mor.dataPath)

    // same visible rows either way (sanity before reporting numbers)
    val a = TableOps.snapshot(spark, cow)
      .select("o_orderkey", "ver", "o_totalprice")
    val b = TableOps.snapshot(spark, mor)
      .select("o_orderkey", "ver", "o_totalprice")
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "COW and MOR disagree — measurement void")

    println(f"""{"bench":"mor_write_amp","sf":"$sfDir","batches":$nBatches,""" +
      f""""cow_seed_s":$cowSeed%.2f,"cow_ingest_s":$cowIngest%.2f,""" +
      f""""cow_data_bytes":$cowBytes,"mor_seed_s":$morSeed%.2f,""" +
      f""""mor_ingest_s":$morIngest%.2f,"mor_fold_s":$morFold%.2f,""" +
      f""""mor_data_bytes":$morBytes}""")
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    spark.stop()
  }
}
