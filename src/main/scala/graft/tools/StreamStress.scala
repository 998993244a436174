package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming throughput / state-size stress harness — the capacity
  * number a cluster deployment needs FIRST: rows/sec and state-store
  * size at a key cardinality where state actually dominates (the
  * sf-replay driver queries prove correctness but are harness-bound —
  * their wall time is micro-batch overhead, not state work).
  *
  * Generates an in-order event stream fully distributed (spark.range +
  * hash-derived columns, no driver-side data): `keys` distinct keys ×
  * `eventsPerKey` events each, event time advancing one 30-minute step
  * per round, written as `files` slices of 8 parquet files each so
  * `maxFilesPerTrigger=8` makes each slice one micro-batch (watermark
  * 0s ⇒ every batch finalizes the previous slice across ALL keys —
  * the state path bears full weight every batch). A final far-future
  * sentinel slice flushes the tail. The run SELF-CHECKS that the
  * source actually delivered every generated row (`input_rows` in the
  * output vs the expected count) — mtime ties between adjacent slice
  * writes could otherwise reorder files and let the admission gate
  * drop rows silently, publishing an inflated rows/sec.
  *
  * Ops (the four stateful families on the driver board):
  *   - `rolling`  — [[graft.streaming.StreamingFeatures.rollingRange]]
  *     (FMGWS; pending window + carry per key)
  *   - `asof`     — [[graft.streaming.StreamingAsOf.asOfEnrich]]
  *     (FMGWS; pending + O(1) carried ref per key)
  *   - `tumbling` — native streaming window aggregation (30-min
  *     windows close every batch; state ≈ open windows × keys)
  *   - `sessions` — native `session_window` (45-min gap > 30-min step
  *     ⇒ ONE ever-growing session per key, merged every batch — the
  *     worst-case session-merge path)
  *
  * Provider `default` = HDFSBackedStateStoreProvider (in-JVM maps),
  * `rocksdb` = RocksDBStateStoreProvider (off-heap + SST files) — a
  * fresh checkpoint per run, so the session conf applies.
  *
  * Usage:
  *   runMain graft.tools.StreamStress <op> <keys> <eventsPerKey>
  *     <files> <default|rocksdb>
  * Prints ONE line: `STRESS {json}` with wall sec, rows/sec, the last
  * progress's state rows/bytes, and the on-disk state checkpoint size
  * (the provider-neutral truth both providers checkpoint).
  */
object StreamStress {

  private val T0 = 1700000000L * 1000000L // µs
  private val StepUs = 1800L * 1000000L   // 30 min between rounds

  def main(args: Array[String]): Unit = {
    val Array(op, keysS, epkS, filesS, provider) = args.take(5)
    val keys = keysS.toLong; val epk = epkS.toInt; val files = filesS.toInt
    require(epk % files == 0, "eventsPerKey must divide evenly by files")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        provider match {
          case "rocksdb" => "org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider"
          case _ => "org.apache.spark.sql.execution.streaming." +
            "state.HDFSBackedStateStoreProvider"
        })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files
      .createTempDirectory(s"graft-stress-$op").toString
    val srcDir = s"$base/src"; val chk = s"$base/chk"
    val perFile = epk / files

    // ---- generate: slice f covers rounds [f*perFile, (f+1)*perFile)
    // ts = T0 + round*step + sub-second per-key jitter (ties broken by
    // event_id anyway; jitter keeps per-key timestamps distinct)
    def slice(f: Int) = spark.range(keys * perFile * f,
        keys * perFile * (f + 1), 1L, 32)
      .withColumn("round", expr(s"id div ${keys}L")) // integer division
      .select(
        (col("id") % keys).as("user_id"),
        col("id").as("event_id"),
        timestamp_micros(lit(T0) + col("round") * StepUs +
          pmod(col("id"), lit(997L)) * 1000L).as("ts"),
        (pmod(col("id"), lit(100L))).cast("double").as("value"),
        when(col("round") % 2 === 0, "view")
          .otherwise("purchase").as("event_type"))
    // 8 parquet files per slice + maxFilesPerTrigger=8 ⇒ one
    // micro-batch per slice (a 32-file slice would shatter into 32
    // batches and measure micro-batch overhead, not state work)
    (0 until files).foreach(f =>
      slice(f).coalesce(8).write.mode("append").parquet(srcDir))
    // sentinel slice: far-future row flushes every key's tail
    spark.range(1).select(lit(-1L).as("user_id"),
        lit(-1L).as("event_id"),
        timestamp_micros(lit(T0 + (epk.toLong + 48L) * StepUs)).as("ts"),
        lit(0.0).as("value"), lit("view").as("event_type"))
      .write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(srcDir)

    import spark.implicits._
    val q: StreamingQuery = (op match {
      case "rolling" =>
        graft.streaming.StreamingFeatures.rollingRange(
          in.select("user_id", "event_id", "ts", "value")
            .as[graft.streaming.StreamingFeatures.RollEvent],
          trailingMicros = 3600L * 1000000L, watermarkDelay = "0 seconds")
          .writeStream
      case "asof" =>
        graft.streaming.StreamingAsOf.asOfEnrich(
          in.select("user_id", "event_id", "ts", "event_type")
            .as[graft.streaming.StreamingFeatures.TransEvent],
          refType = "view", probeType = "purchase",
          watermarkDelay = "0 seconds").writeStream
      case "asof_composite" =>
        graft.streaming.StreamingAsOf.asOfEnrichRows(
          in.withColumn("region", pmod(col("event_id"), lit(3L))),
          keys = Seq("user_id", "region"), refType = "view",
          probeType = "purchase", watermarkDelay = "0 seconds")
          .writeStream
      case "gapfill" =>
        graft.streaming.StreamingFeatures.gapFillLocf(
          in.select("user_id", "event_id", "ts", "value")
            .as[graft.streaming.StreamingFeatures.RollEvent],
          stepMicros = StepUs, watermarkDelay = "0 seconds")
          .writeStream
      case "transitions" =>
        graft.streaming.StreamingFeatures.transitions(
          in.select("user_id", "event_id", "ts", "event_type")
            .as[graft.streaming.StreamingFeatures.TransEvent],
          watermarkDelay = "0 seconds").writeStream
      case "tumbling" =>
        in.withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
          .writeStream.outputMode("append")
      case "sessions" =>
        in.withWatermark("ts", "0 seconds")
          .groupBy(session_window(col("ts"), "45 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
          .writeStream.outputMode("append")
      case other => sys.error(s"unknown op $other")
    }).format("noop").option("checkpointLocation", chk).start()

    val t0 = System.nanoTime()
    // the STRESS line prints ONLY on success — a crashed run must not
    // land in the sweep artifact looking like a measurement
    try {
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = keys * epk + 1L
      // PEAK state across the run (the capacity number), plus the
      // post-flush tail (what a long-lived deployment carries forever)
      val progress = q.recentProgress.toSeq
      val sts = progress
        .filter(_.stateOperators.nonEmpty).map(_.stateOperators.head)
      val stateRows = if (sts.isEmpty) -1L else sts.map(_.numRowsTotal).max
      val stateMem = if (sts.isEmpty) -1L
        else sts.map(_.memoryUsedBytes).max
      val tailRows = sts.lastOption.map(_.numRowsTotal).getOrElse(-1L)
      // delivery self-check: every generated row must have entered the
      // stream (caveat: recentProgress keeps the last ~100 updates, so
      // with >100 micro-batches this undercounts — files is ≤ ~25 in
      // every sweep config)
      val inputRows = progress.map(_.numInputRows).sum
      require(inputRows == rows, s"source delivered $inputRows of $rows " +
        "generated rows — mtime-tied slice files were reordered past the " +
        "watermark (or progress history overflowed); this run's numbers " +
        "are not publishable")
      q.stop()
      // on-disk truth both providers checkpoint (HDFS: delta/snapshot
      // files; RocksDB: SST + changelog)
      val stateDir = java.nio.file.Paths.get(chk, "state")
      val diskBytes =
        if (java.nio.file.Files.exists(stateDir)) {
          val s = java.nio.file.Files.walk(stateDir)
          try s.filter(p => java.nio.file.Files.isRegularFile(p))
            .mapToLong(p => java.nio.file.Files.size(p)).sum()
          finally s.close()
        } else -1L
      println(f"""STRESS {"op":"$op","keys":$keys,"events_per_key":$epk,""" +
        f""""files":$files,"provider":"$provider","rows":$rows,""" +
        f""""input_rows":$inputRows,""" +
        f""""wall_sec":$wall%.2f,"rows_per_sec":${rows / wall}%.0f,""" +
        f""""state_rows_peak":$stateRows,"state_mem_bytes_peak":$stateMem,""" +
        f""""state_rows_tail":$tailRows,"state_disk_bytes":$diskBytes}""")
    } finally if (q.isActive) q.stop()
    spark.stop()
    // scratch cleanup: stress dirs can be GBs
    def rm(p: java.nio.file.Path): Unit = {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { f => java.nio.file.Files.deleteIfExists(f); () }
      finally s.close()
    }
    rm(java.nio.file.Paths.get(base))
  }
}
