package graft.tools

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off measurement backing the SCALE.md write-payload rows: against
  * a seeded orders table, apply identical sparse update batches via
  * (a) whole-row `upsert`, (b) `upsert(partial = true)` (per-column
  * latest-non-null), and (c) `insertInto` (no-dedup append) — wall
  * seconds per round. Claims under test: the partial payload's extra
  * aggregation buffers (d `max`-over-struct aggs instead of one
  * `max_by`) cost a bounded constant factor, never a new shuffle; and
  * the no-dedup insert undercuts both (no merge aggregation at all).
  * Not part of the driver bench set (scratch-dir lifecycle); run
  * manually:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.PayloadBench"
  * }}}
  */
object PayloadBench {

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
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .withColumn("ver", lit(0))
    val nRounds = 5

    // round i updates every (key % 5 == i) row — a sparse CDC-shaped
    // batch touching 20% of keys, identical input to every path
    def batch(i: Int): DataFrame = orders
      .filter(col("o_orderkey") % 5 === i)
      .withColumn("o_totalprice", col("o_totalprice") + i)
      .withColumn("ver", lit(i + 1))

    val root = java.nio.file.Files.createTempDirectory("graft-paybench")
    def mkTable(name: String) = KeyedTable(name, s"$root/$name",
      Seq("o_orderkey"), "ver")
    def timed[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val whole = mkTable("whole_row")
    val part = mkTable("partial")
    val ins = mkTable("insert_nodedup")
    Seq(whole, part, ins).foreach(t => TableOps.upsert(spark, t, orders))

    var (tW, tP, tI) = (0.0, 0.0, 0.0)
    (0 until nRounds).foreach { i =>
      val b = batch(i)
      val w = timed(TableOps.upsert(spark, whole, b))
      val p = timed(TableOps.upsert(spark, part, b, partial = true))
      val n = timed(TableOps.insertInto(spark, ins, b))
      tW += w; tP += p; tI += n
      println(f"round $i: whole-row $w%.2f s, partial $p%.2f s, " +
        f"insert $n%.2f s")
    }
    println(f"total over $nRounds rounds: whole-row $tW%.1f s, partial " +
      f"$tP%.1f s (${tP / tW}%.2fx of whole-row), insert $tI%.1f s " +
      f"(${tI / tW}%.2fx)")

    // batches carry no nulls, so whole-row and partial must converge to
    // the identical visible state
    val a = TableOps.snapshot(spark, whole)
      .select("o_orderkey", "ver", "o_totalprice")
    val b = TableOps.snapshot(spark, part)
      .select("o_orderkey", "ver", "o_totalprice")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0, s"payloads diverged: $diff differing rows")
    // the insert table accumulated duplicates instead of merging
    val insRows = TableOps.snapshot(spark, ins).count()
    val expected = orders.count() + (0 until nRounds)
      .map(i => orders.filter(col("o_orderkey") % 5 === i).count()).sum
    require(insRows == expected,
      s"insert path rows $insRows, expected $expected")
    println(s"payload equality + insert duplicate accounting: OK")

    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    spark.stop()
  }
}
