package graft.tools

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement of COMMIT-METADATA scaling — the Hudi-timeline-
  * bloat concern: how do read-side planning (snapshot, stats-pruned
  * read), inspection (timeline, storageAudit), and the write path
  * itself behave as the timeline grows to hundreds of commits, and how
  * much does [[TableOps.clean]] claw back? The table format's bet is
  * that every manifest is a kilobyte JSON pointer and reads resolve
  * ONE manifest (plus a newest-wins scan of the commit dir listing),
  * so read cost should stay FLAT in commit count while the commit-dir
  * listing grows linearly but stays metadata-sized. Not part of the
  * driver bench set (scratch-dir lifecycle); run manually:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TimelineBench"
  * }}}
  *
  * Prints one JSON line per checkpoint: commits so far, median write
  * seconds in the last block, snapshot-count / stats-pruned-read /
  * timeline / storageAudit wall seconds, then a final line after
  * `clean(retainCommits=10)`.
  */
object TimelineBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val total = sys.env.getOrElse("SPARK_GRAFT_TLB_COMMITS", "200").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(20000).cache()
    orders.count()
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)

    val root = java.nio.file.Files.createTempDirectory("graft-tlbench")
    val t = KeyedTable("tl", s"$root/tl", Seq("o_orderkey"), "ver",
      statsColumns = Seq("o_orderkey"))
    def timed(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    TableOps.upsert(spark, t,
      orders.withColumn("ver", lit(0)))

    val checkpoints = Seq(25, 50, 100, 200).filter(_ <= total)
    var done = 1
    var writes = Vector.empty[Double]
    def report(tag: String): Unit = {
      val snapS = timed(TableOps.snapshot(spark, t).count())
      val pruneS = timed(TableOps.snapshotWhere(spark, t,
        col("o_orderkey") <= maxKey / 10).count())
      val tlS = timed(TableOps.timeline(spark, t).count())
      val auditS = timed(TableOps.storageAudit(spark, t).count())
      val wMed =
        if (writes.isEmpty) 0.0
        else writes.sorted.apply(writes.size / 2)
      println(f"""{"tag":"$tag","commits":$done,"write_median_sec":$wMed%.3f,"snapshot_sec":$snapS%.3f,"pruned_read_sec":$pruneS%.3f,"timeline_sec":$tlS%.3f,"audit_sec":$auditS%.3f}""")
      writes = Vector.empty
    }
    report("seeded")
    for (n <- checkpoints) {
      while (done < n) {
        // a small keyed batch: 200 keys spread over the table
        val batch = orders
          .filter(col("o_orderkey") % lit(100L) === lit((done % 100).toLong))
          .limit(200)
          .withColumn("ver", lit(done))
        writes :+= timed(TableOps.upsert(spark, t, batch))
        done += 1
      }
      report(s"commits_$n")
    }
    val cleanS = timed(TableOps.clean(spark, t, retainCommits = 10))
    println(f"""{"tag":"cleaned","clean_sec":$cleanS%.3f}""")
    report("post_clean")

    // Phase 2: LIVE RETENTION — an archival clean after every commit
    // (the stream_sink_retention_replay discipline). The claim under
    // measurement: the active timeline a reader lists stays O(keep) at
    // any stream length, so write/snapshot cost is FLAT in total
    // commits (phase 1 shows the unretained slope), while the archived
    // history stays complete and queryable. The full-history read cost
    // is allowed to grow (one archive batch per clean) — it is an
    // audit surface, not a data-path one.
    val t2 = KeyedTable("tlr", s"$root/tlr", Seq("o_orderkey"), "ver",
      statsColumns = Seq("o_orderkey"))
    TableOps.upsert(spark, t2, orders.withColumn("ver", lit(0)))
    val log2 = graft.tables.CommitLog(t2, spark)
    var done2 = 1
    var writes2 = Vector.empty[Double]
    var cleans2 = Vector.empty[Double]
    for (n <- checkpoints) {
      while (done2 < n) {
        val batch = orders
          .filter(col("o_orderkey") % lit(100L) === lit((done2 % 100).toLong))
          .limit(200)
          .withColumn("ver", lit(done2))
        writes2 :+= timed(TableOps.upsert(spark, t2, batch))
        cleans2 :+= timed(
          TableOps.clean(spark, t2, retainCommits = 10, archive = true))
        done2 += 1
      }
      val active = log2.listCommits().size
      val archived = log2.archivedMetas().size
      val snapS = timed(TableOps.snapshot(spark, t2).count())
      val tlActiveS = timed(TableOps.timeline(spark, t2).count())
      val tlFullS = timed(
        TableOps.timeline(spark, t2, includeArchived = true).count())
      def med(v: Vector[Double]) =
        if (v.isEmpty) 0.0 else v.sorted.apply(v.size / 2)
      println(f"""{"tag":"retained_$n","commits":$done2,"active":$active,"archived":$archived,"write_median_sec":${med(writes2)}%.3f,"clean_median_sec":${med(cleans2)}%.3f,"snapshot_sec":$snapS%.3f,"timeline_active_sec":$tlActiveS%.3f,"timeline_full_sec":$tlFullS%.3f}""")
      writes2 = Vector.empty; cleans2 = Vector.empty
    }
    spark.stop()
  }
}
