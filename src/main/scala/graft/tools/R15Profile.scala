package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization-round phase profiler (dev tool, not part of the
  * driver contract): times sub-phases of the slowest board queries so
  * the optimization targets the measured cost, not the guessed one.
  */
object R15Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.bench.timing", "true")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[r15prof] ${(System.nanoTime() - t0) / 1e9}%8.2f  $name")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    val which = if (args.nonEmpty) args.toSet else Set("pagerank", "stream")

    if (which("jobs")) {
      // per-job wall-time attribution for a list of queries: run each
      // query once warm, then once with a listener printing every job's
      // duration + task totals, so optimization targets the measured
      // job, not the guessed one
      val names = args.toSeq.filterNot(_ == "jobs")
      import org.apache.spark.scheduler._
      names.foreach { n =>
        noop(graft.SparkEntry.queries(n)(spark, dir)); reset() // warm
        val jobs = new java.util.concurrent.ConcurrentHashMap[
          Int, (Long, String)]()
        val done = scala.collection.mutable.ListBuffer.empty[
          (Int, Double, String)]
        val listener = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit =
            jobs.put(j.jobId, (System.nanoTime(),
              Option(j.properties.getProperty("spark.job.description"))
                .getOrElse("")))
          override def onJobEnd(j: SparkListenerJobEnd): Unit = {
            val st = jobs.remove(j.jobId)
            if (st != null) done.synchronized {
              done += ((j.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
            }
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        noop(graft.SparkEntry.queries(n)(spark, dir))
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let listener events drain
        spark.sparkContext.removeSparkListener(listener)
        println(f"[r15prof] ===== $n total=$total%.2f jobs=${done.size}")
        done.sortBy(-_._2).take(25).foreach { case (id, sec, desc) =>
          println(f"[r15prof]   job#$id%-4d $sec%6.2f  ${desc.take(90)}")
        }
        reset()
      }
    }

    if (which("prab")) {
      // same-moment A/B: the r14 pageRankFixed shape (sinks UNPINNED —
      // recomputed per round) inlined here vs the r15 library (sinks
      // pinned once); alternating runs in one JVM so ambient host load
      // hits both arms equally (the standing winnow-protocol posture).
      import org.apache.spark.sql.DataFrame
      def idiv(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) = call_function("div", a, b)
      def pin(df: DataFrame): DataFrame = df.localCheckpoint()
      def oldFixed(edges: DataFrame): DataFrame = {
        val scale = 1000000000000L
        val e = edges.select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull &&
            col("src") =!= col("dst")).distinct()
        val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val adj = pin(e.join(outdeg, Seq("src")))
        val nodes = pin(adj.select(col("src").as("node"))
          .union(adj.select(col("dst").as("node"))).distinct())
        val nDf = broadcast(nodes.agg(count(lit(1)).as("_n")))
        val sinks = nodes.join(adj.select(col("src").as("node")),
          Seq("node"), "left_anti") // ← the r14 shape: unpinned
        val teleport = lit(15L * scale / 100L)
        var ranks = pin(nodes.crossJoin(nDf)
          .select(col("node"), idiv(lit(scale), col("_n")).as("rank")))
        for (_ <- 1 to 3) {
          val dangling = broadcast(ranks.join(sinks, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("_dm")))
          val contribs = adj
            .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"),
              idiv(col("rank"), col("outdeg")).as("c"))
            .groupBy("node").agg(sum(col("c")).as("inflow"))
          val next = pin(nodes.join(contribs, Seq("node"), "left")
            .crossJoin(nDf).crossJoin(dangling)
            .select(col("node"), (idiv(teleport, col("_n")) +
              idiv(lit(85L) * (coalesce(col("inflow"), lit(0L)) +
                idiv(col("_dm"), col("_n"))), lit(100L))).as("rank")))
          ranks = next
        }
        ranks.select(col("node").as("l_suppkey"), col("rank").as("rank_u"),
          (col("rank").cast("double") / lit(1e12)).as("rank"))
          .orderBy("l_suppkey")
      }
      def edges(): DataFrame = {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        li.toDF("ok", "src").join(li.toDF("ok", "dst"), Seq("ok"))
          .filter(col("src") =!= col("dst")).select("src", "dst")
      }
      // warm both
      noop(oldFixed(edges())); reset()
      noop(graft.SparkEntry.queries("graph_pagerank")(spark, dir)); reset()
      val olds = scala.collection.mutable.ListBuffer.empty[Double]
      val news = scala.collection.mutable.ListBuffer.empty[Double]
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); noop(oldFixed(edges()))
        olds += (System.nanoTime() - t0) / 1e9; reset()
        val t1 = System.nanoTime()
        noop(graft.SparkEntry.queries("graph_pagerank")(spark, dir))
        news += (System.nanoTime() - t1) / 1e9; reset()
      }
      println(f"[r15prof] prab OLD (unpinned sinks) runs=${olds.map(v => f"$v%.2f").mkString(",")} median=${olds.sorted.apply(1)}%.2f")
      println(f"[r15prof] prab NEW (pinned sinks)   runs=${news.map(v => f"$v%.2f").mkString(",")} median=${news.sorted.apply(1)}%.2f")
    }

    if (which("pagerank")) {
      // ——— graph_pagerank decomposition
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      time("pr: li distinct")(noop(li))
      val e = li.toDF("ok", "src").join(li.toDF("ok", "dst"), Seq("ok"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      time("pr: edges (self-join)")(noop(e))
      val ed = e.distinct()
      time("pr: edges distinct")(noop(ed))
      val outdeg = ed.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val adjDf = ed.join(outdeg, Seq("src"))
      time("pr: adj join")(noop(adjDf))
      time("pr: adj localCheckpoint") {
        val p = adjDf.localCheckpoint()
        graft.ext.Dedup.releaseLocalCheckpoint(p)
      }
      reset()
      time("pr: full graph_pagerank")(
        noop(graft.SparkEntry.queries("graph_pagerank")(spark, dir)))
      reset()
      time("pr: full graph_pagerank again")(
        noop(graft.SparkEntry.queries("graph_pagerank")(spark, dir)))
      reset()
    }

    if (which("eceab")) {
      // same-moment A/B for the scoredDocs persist: the r14 shape
      // (no persist — each commit-slice upsert re-runs the stats
      // lineage) inlined vs the r15 library query, alternating.
      import graft.tables.{KeyedTable, CheckpointStore}
      import graft.ops.TableOps
      def oldEceBy(): org.apache.spark.sql.DataFrame = {
        val base = java.nio.file.Files
          .createTempDirectory("r15prof-eceab").toString
        val src = KeyedTable("ieceby_src_ab", s"$base/src",
          Seq("doc_id"), "doc_id")
        val stateN = graft.ops.IncrementalAgg.stateTable(
          "ieceby_labels_ab", s"$base/labels", Seq("source", "bin"))
        val stateS = graft.ops.IncrementalAgg.stateTable(
          "ieceby_scores_ab", s"$base/scores", Seq("source", "bin"))
        val storeN = CheckpointStore(s"$base/cpN", spark)
        val storeS = CheckpointStore(s"$base/cpS", spark)
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val scoredDocs = graft.ext.TextStats
          .stats(docs, "doc_id", "text")
          .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
          .filter(col("stopword_ratio").isNotNull &&
            col("source").isNotNull)
          .select(col("doc_id"), col("source"),
            graft.ext.ModelEval.binOf(col("stopword_ratio"),
              bins = 10, lo = 0.0, hi = 0.25).as("bin"),
            (col("lang") === "en").cast("int").as("is_en"),
            col("stopword_ratio").cast("decimal(28,9)").as("score_dec"))
        (0 until 3).foreach { b =>
          TableOps.upsert(spark, src,
            scoredDocs.filter(pmod(col("doc_id"), lit(3)) === b))
          graft.ops.IncrementalAgg.refresh(spark, src, stateN, storeN,
            Seq("source", "bin"), "is_en")
          graft.ops.IncrementalAgg.refresh(spark, src, stateS, storeS,
            Seq("source", "bin"), "score_dec")
        }
        val n = TableOps.snapshot(spark, stateN)
          .select(col("source"), col("bin"), col("cnt").as("n"),
            col("sum_v").cast("long").as("n_pos"))
        val sums = TableOps.snapshot(spark, stateS)
          .select(col("source"), col("bin"), col("sum_v").as("sum_s"))
        graft.ext.ModelEval
          .eceByFromCounts(n.join(sums, Seq("source", "bin")), "source")
          .orderBy("source")
      }
      noop(oldEceBy()); reset()
      noop(graft.SparkEntry.queries("i_incremental_ece_by")(spark, dir))
      reset()
      val olds = scala.collection.mutable.ListBuffer.empty[Double]
      val news = scala.collection.mutable.ListBuffer.empty[Double]
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); noop(oldEceBy())
        olds += (System.nanoTime() - t0) / 1e9; reset()
        val t1 = System.nanoTime()
        noop(graft.SparkEntry.queries("i_incremental_ece_by")(spark, dir))
        news += (System.nanoTime() - t1) / 1e9; reset()
      }
      println(f"[r15prof] eceab OLD (no persist) runs=${olds.map(v => f"$v%.2f").mkString(",")} median=${olds.sorted.apply(1)}%.2f")
      println(f"[r15prof] eceab NEW (persisted)  runs=${news.map(v => f"$v%.2f").mkString(",")} median=${news.sorted.apply(1)}%.2f")
    }

    if (which("noDataAb")) {
      // same-moment alternating timing of one full replay harness under
      // noDataMicroBatches=true (old) vs =false (new), 3 reps each
      def runOnce(noData: String, rep: Int): Double = {
        spark.conf.set(
          "spark.sql.streaming.noDataMicroBatches.enabled", noData)
        val t0 = System.nanoTime()
        val proj = graft.queries.CoreQueries.events(spark, dir)
          .select("user_id", "event_id", "ts", "value")
        val tmp = java.nio.file.Files
          .createTempDirectory(s"r15ab-$noData-$rep").toString
        proj.write.mode("overwrite").parquet(s"$tmp/src")
        val maxSec = proj.agg(max(unix_micros(col("ts")))).head()
          .getLong(0) / 1000000L + 1L
        import spark.implicits._
        val q = spark.readStream.schema(proj.schema).parquet(s"$tmp/src")
          .as[graft.streaming.StreamingFeatures.RollEvent]
          .transform(in => graft.streaming.StreamingFeatures
            .rollingRange(in, 3600L * 1000000L, "0 seconds"))
          .writeStream.format("memory").queryName(s"r15ab_${noData}_$rep")
          .option("checkpointLocation", s"$tmp/chk")
          .outputMode("append").start()
        q.processAllAvailable()
        (1 to 2).foreach { i =>
          spark.range(1).select(lit(-1L).as("user_id"),
            lit(-i.toLong).as("event_id"),
            timestamp_micros(lit((maxSec + i * 3600L) * 1000000L)).as("ts"),
            lit(0.0).as("value"))
            .write.mode("append").parquet(s"$tmp/src")
          q.processAllAvailable()
        }
        q.stop()
        spark.table(s"r15ab_${noData}_$rep")
          .filter(col("user_id") =!= -1L)
          .select("event_id", "user_id", "roll_cnt", "roll_sum")
          .orderBy("event_id")
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        reset()
        sec
      }
      runOnce("true", 0); runOnce("false", 0) // warm both arms
      val olds = scala.collection.mutable.ListBuffer.empty[Double]
      val news = scala.collection.mutable.ListBuffer.empty[Double]
      (1 to 3).foreach { r =>
        olds += runOnce("true", r)
        news += runOnce("false", r + 10)
      }
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      println(f"[r15prof] noDataAb OLD (noData=true)  runs=${olds.map(v => f"$v%.2f").mkString(",")} median=${olds.sorted.apply(1)}%.2f")
      println(f"[r15prof] noDataAb NEW (noData=false) runs=${news.map(v => f"$v%.2f").mkString(",")} median=${news.sorted.apply(1)}%.2f")
    }

    if (which("batchcount")) {
      // deterministic evidence for the noDataMicroBatches change: the
      // number of micro-batches one replay executes under each setting
      // (ambient host load can shift seconds, not batch counts)
      Seq("true", "false").foreach { noData =>
        s"count with noDataMicroBatches=$noData" match { case label =>
          spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", noData)
          val proj = graft.queries.CoreQueries.events(spark, dir)
            .select("user_id", "event_id", "ts", "value")
          val tmp = java.nio.file.Files
            .createTempDirectory(s"r15prof-bc-$noData").toString
          proj.write.mode("overwrite").parquet(s"$tmp/src")
          val maxSec = proj.agg(max(unix_micros(col("ts")))).head()
            .getLong(0) / 1000000L + 1L
          import spark.implicits._
          val q = spark.readStream.schema(proj.schema).parquet(s"$tmp/src")
            .as[graft.streaming.StreamingFeatures.RollEvent]
            .transform(in => graft.streaming.StreamingFeatures
              .rollingRange(in, 3600L * 1000000L, "0 seconds"))
            .writeStream.format("memory").queryName(s"r15bc_$noData")
            .option("checkpointLocation", s"$tmp/chk")
            .outputMode("append").start()
          q.processAllAvailable()
          (1 to 2).foreach { i =>
            spark.range(1).select(lit(-1L).as("user_id"),
              lit(-i.toLong).as("event_id"),
              timestamp_micros(lit((maxSec + i * 3600L) * 1000000L)).as("ts"),
              lit(0.0).as("value"))
              .write.mode("append").parquet(s"$tmp/src")
            q.processAllAvailable()
          }
          val batches = q.recentProgress.length
          val rows = spark.table(s"r15bc_$noData")
            .filter(col("user_id") =!= -1L).count()
          q.stop()
          println(s"[r15prof] $label: micro-batches=$batches " +
            s"output-rows=$rows")
        }
      }
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }

    if (which("stream")) {
      // ——— stream replay harness decomposition (rolling replay shape)
      val proj = graft.queries.CoreQueries.events(spark, dir)
        .select("user_id", "event_id", "ts", "value")
      val tmp = java.nio.file.Files
        .createTempDirectory("r15prof-stream").toString
      time("st: write src parquet")(
        proj.write.mode("overwrite").parquet(s"$tmp/src"))
      time("st: max ts scan")(proj.agg(max(unix_micros(col("ts")))).head())
      import spark.implicits._
      val q = time("st: start query") {
        spark.readStream.schema(proj.schema).parquet(s"$tmp/src")
          .as[graft.streaming.StreamingFeatures.RollEvent]
          .transform(in => graft.streaming.StreamingFeatures
            .rollingRange(in, 3600L * 1000000L, "0 seconds"))
          .writeStream.format("memory").queryName("r15prof_roll")
          .option("checkpointLocation", s"$tmp/chk")
          .outputMode("append").start()
      }
      time("st: batch 1 (all data)")(q.processAllAvailable())
      val maxSec = 4102444800L // sentinel base far past any real ts
      (1 to 2).foreach { i =>
        time(s"st: sentinel append $i") {
          spark.range(1).select(lit(-1L).as("user_id"),
            lit(-i.toLong).as("event_id"),
            timestamp_micros(lit((maxSec + i * 3600L) * 1000000L)).as("ts"),
            lit(0.0).as("value"))
            .write.mode("append").parquet(s"$tmp/src")
        }
        time(s"st: sentinel batch $i")(q.processAllAvailable())
      }
      time("st: stop")(q.stop())
      time("st: fetch+order+noop")(
        noop(spark.table("r15prof_roll")
          .filter(col("user_id") =!= -1L)
          .select("event_id", "user_id", "roll_cnt", "roll_sum")
          .orderBy("event_id")))
      reset()
      time("st: full stream_rolling_replay")(
        noop(graft.SparkEntry.queries("stream_rolling_replay")(spark, dir)))
      reset()
    }

    spark.stop()
  }
}
