package graft.tools

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off measurement backing the SCALE.md replace-commit row: refresh
  * whole partitions of an orders table via keyed `upsert` (merge
  * against the existing partition — read + merge + rewrite) vs
  * `insertOverwrite` (write the batch, repoint the manifest), and
  * report wall seconds per refresh round plus visible-row equality.
  * The backfill pattern both paths express is "recompute a day, swap
  * it in" — the claim under test is that the replace commit's cost is
  * O(batch) while the upsert's grows with the partition it must merge.
  * Not part of the driver bench set (scratch-dir lifecycle); run
  * manually:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ReplaceBench"
  * }}}
  */
object ReplaceBench {

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

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("omonth", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("ver", lit(0))
    val months = orders.select("omonth").distinct()
      .orderBy("omonth").collect().map(_.getString(0))
    val nRounds = math.min(8, months.length)

    // a refresh round recomputes EVERY row of one month (the backfill
    // unit) with a bumped version — identical input to both paths
    def refresh(i: Int): DataFrame = orders
      .filter(col("omonth") === months(i))
      .withColumn("ver", lit(i + 1))
      .withColumn("o_totalprice", col("o_totalprice") * 2)

    val root = java.nio.file.Files.createTempDirectory("graft-replbench")
    def mkTable(name: String) = KeyedTable(name, s"$root/$name",
      Seq("o_orderkey"), "ver", Seq("omonth"))
    def timed[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val up = mkTable("upsert_path")
    val ow = mkTable("overwrite_path")
    val seedUp = timed(TableOps.upsert(spark, up, orders))
    val seedOw = timed(TableOps.upsert(spark, ow, orders))
    println(f"seed load: upsert-table $seedUp%.1f s, overwrite-table $seedOw%.1f s")

    var tUp = 0.0
    var tOw = 0.0
    (0 until nRounds).foreach { i =>
      val b = refresh(i)
      val u = timed(TableOps.upsert(spark, up, b))
      val o = timed(TableOps.insertOverwrite(spark, ow, b))
      tUp += u; tOw += o
      println(f"round $i (${months(i)}): upsert $u%.2f s, insertOverwrite $o%.2f s")
    }
    println(f"total over $nRounds refresh rounds: upsert $tUp%.1f s, " +
      f"insertOverwrite $tOw%.1f s (${tUp / tOw}%.1fx)")

    // the refreshed batches carry every key of their month, so both
    // paths must converge to identical visible state
    val a = TableOps.snapshot(spark, up)
      .select("o_orderkey", "ver", "o_totalprice")
    val b = TableOps.snapshot(spark, ow)
      .select("o_orderkey", "ver", "o_totalprice")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0, s"paths diverged: $diff differing rows")
    println(s"visible-row equality: OK (${a.count()} rows)")

    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    spark.stop()
  }
}
