package graft.tools

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Curve-layout comparison: the same table compacted along the Morton
  * (z-order) and Hilbert curves, probed with the same box predicates —
  * reports files-touched per curve (the locality claim, measured).
  * Usage: `runMain graft.tools.CurveBench <sfDir>`; one JSON line.
  */
object CurveBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val perFile = math.max(orders.count() / 64L, 1L)
    def build(name: String, z: Boolean): KeyedTable = {
      val t = KeyedTable(name,
        s"${java.nio.file.Files.createTempDirectory("graft-curve")}/$name",
        Seq("o_orderkey"), "o_orderkey",
        statsColumns = Seq("o_custkey", "o_totalprice"))
      TableOps.upsert(spark, t, orders, maxRecordsPerFile = perFile)
      if (z) TableOps.compact(spark, t, maxRecordsPerFile = perFile,
        zorderBy = Seq("o_custkey", "o_totalprice"))
      else TableOps.compact(spark, t, maxRecordsPerFile = perFile,
        hilbertBy = Seq("o_custkey", "o_totalprice"))
      t
    }
    val zt = build("orders_cz", z = true)
    val ht = build("orders_ch", z = false)
    // box probes over both clustered dimensions at several selectivities
    val boxes = Seq(
      (col("o_custkey") >= 100L && col("o_custkey") < 200L,
        "cust_100_200"),
      (col("o_totalprice") >= 1000.0 && col("o_totalprice") < 2000.0,
        "price_1k_2k"),
      (col("o_custkey") >= 100L && col("o_custkey") < 500L &&
        col("o_totalprice") >= 1000.0 && col("o_totalprice") < 5000.0,
        "box_2d"))
    val total = TableOps.snapshot(spark, zt).inputFiles.length
    val cells = boxes.map { case (pred, label) =>
      val zf = TableOps.snapshotWhere(spark, zt, pred).inputFiles.length
      val hf = TableOps.snapshotWhere(spark, ht, pred).inputFiles.length
      s""""$label":{"zorder_files":$zf,"hilbert_files":$hf}"""
    }
    println(s"""{"metric":"curve_files","total_files":$total,${cells.mkString(",")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
