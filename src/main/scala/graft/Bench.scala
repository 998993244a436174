package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Methodology:
  *   - each query first executes once at sf0.001 (JVM/JIT/codegen warm-up —
  *     measures the engine, not HotSpot), then runs THREE timed iterations on
  *     the target scale factor; the reported number is the MEDIAN, so a single
  *     GC pause / machine-load spike cannot contaminate the artifact;
  *   - every iteration writes to a `noop` sink so the FULL plan executes
  *     (including final sorts a bare count() would let the optimizer elide)
  *     without measuring result serialization;
  *   - between iterations the SQL cache is cleared and every persisted RDD
  *     (e.g. localCheckpoint blocks left by iterative queries) is dropped, so
  *     no query inherits — or is charged for — another query's cached state;
  *   - a query whose three runs disagree by more than `SuspectSpread`× is
  *     flagged in "suspect": its median is still reported but should be
  *     treated as machine-load noise, not an engine regression/improvement.
  */
object Bench {
  /** max/min ratio across the 3 timed runs above which the median is
    * untrustworthy (external load, paging, …). Quiet-machine run-to-run
    * jitter is <1.3×; 2.5× leaves headroom for GC variance while catching
    * bursty concurrent load much earlier than the old 5× bound. */
  private val SuspectSpread = 2.5
  private val TimedRuns = 3

  /** Fixed-cost CPU sentinel (r7 lesson: a UNIFORM ~1.3× ambient-load
    * inflation passes any per-query spread check — the artifact needs an
    * absolute yardstick). The sentinel is a data-independent codegen'd
    * hash fold over `spark.range` that saturates every core with the
    * same work on every machine/round; its wall time is reported in the
    * artifact (pre + post, bracketing the timed queries) so any round's
    * numbers can be load-normalized against any other's, and the run
    * self-flags when the sentinel drifts >1.25× above the quiet-machine
    * nominal. */
  private val SentinelRowsPerCore = 64000000L

  /** Second sentinel, MEMORY-BANDWIDTH-bound (r12 lesson: the winnow
    * pair drifted 2× on a board whose CPU sentinel was FASTER than the
    * comparison round's — a CPU-bound yardstick cannot normalize
    * bandwidth-bound queries, and explode+window shapes are exactly
    * that). Fixed-size explode → shuffle → running-sum Window →
    * hash-fold: row materialization, sort buffers and shuffle traffic
    * dominate, ALU is negligible. Reported pre+post next to the CPU
    * sentinel so cross-day comparisons of bandwidth-bound queries are
    * normalizable instead of argued.
    */
  private val BwSentinelRowsPerCore = 30000L
  private val BwSentinelFanout = 16
  /** Quiet-machine bandwidth-sentinel seconds (calibrated r13 at the
    * driver's local[32]; same conservative-at-lower-core-counts
    * argument as [[SentinelNominal]]). */
  private val BwSentinelNominal = 1.40
  private def sentinelBwSec(spark: SparkSession): Double = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cpus = spark.sparkContext.defaultParallelism
    val t0 = System.nanoTime()
    val w = Window.partitionBy(pmod(col("id"), lit(1024)))
      .orderBy(col("id"), col("k"))
    spark.range(0L, BwSentinelRowsPerCore * cpus, 1L, cpus)
      .select(col("id"),
        explode(sequence(lit(0), lit(BwSentinelFanout - 1))).as("k"))
      .withColumn("rs", sum(col("k")).over(w))
      .agg(expr("bit_xor(xxhash64(rs))"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  /** Quiet-machine sentinel seconds, calibrated round 8 at the
    * driver's local[32] config (measured 0.49–0.59 s quiet). Work is
    * per-core-constant, and LOWER core counts run faster per core
    * (less scheduler overhead), so at any smaller SPARK_GRAFT_CPUS the
    * flag is strictly conservative — it can only under-fire, never
    * false-flag a quiet machine. */
  private val SentinelNominal = 0.55
  private def sentinelSec(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val cpus = spark.sparkContext.defaultParallelism
    val t0 = System.nanoTime()
    spark.range(0L, SentinelRowsPerCore * cpus, 1L, cpus)
      .agg(expr("bit_xor(xxhash64(id))"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Inside the timed loop, per-run self-verification joins (e.g. the ANN
    // raw surfaces' exact-cosine invariant) are skipped: they add corpus
    // scans the r01–r04 artifacts never paid, which would make round-over-
    // round comparison meaningless and mask real probe regressions behind
    // fixed check cost. Verify (the correctness gate) always runs them.
    System.setProperty("graft.bench.timing", "true")

    def execute(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    /** Drop all cached state a query run may have left behind (SQL cache,
      * localCheckpoint / persist blocks) so runs are independent. */
    def resetCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // collect the previous run's garbage NOW so its GC debt is not
      // charged to (and does not inflate) the next timed run
      System.gc()
    }

    // optional subset (comma-separated) — used by the sfN stress bench
    // to run only the most expensive queries on generated data
    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a misspelled subset entry must fail loudly, not silently publish an
    // artifact with the intended query missing
    subset.foreach { s =>
      val unknown = s -- SparkEntry.benchQueries.toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_QUERIES names unknown bench queries: " +
          s"${unknown.toSeq.sorted.mkString(", ")}")
    }
    // optional FAMILY filter (comma-separated name prefixes, e.g.
    // "stream,dedup,eval"): the full quiet board costs minutes — a
    // cross-day re-measure of one family must not pay for the rest.
    // A token selects every bench query it prefixes; each token must
    // hit at least one query (typo protection, same posture as above).
    val families = sys.env.get("SPARK_GRAFT_BENCH_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    families.foreach { fs =>
      val unmatched = fs.filterNot(f =>
        SparkEntry.benchQueries.exists(_.startsWith(f)))
      require(unmatched.isEmpty,
        s"SPARK_GRAFT_BENCH_FAMILIES prefixes match no bench query: " +
          s"${unmatched.sorted.mkString(", ")}")
    }
    // optional EXCLUDE family filter — the complement board: the
    // standing round artifacts are a core board (exclude=stream) and a
    // stream board (families=stream), so cross-day pairs stay cheap as
    // the board grows (the streaming replays are ~90 s of harness).
    val exclude = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    exclude.foreach { fs =>
      val unmatched = fs.filterNot(f =>
        SparkEntry.benchQueries.exists(_.startsWith(f)))
      require(unmatched.isEmpty,
        s"SPARK_GRAFT_BENCH_EXCLUDE_FAMILIES prefixes match no bench " +
          s"query: ${unmatched.sorted.mkString(", ")}")
    }
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      .filter(n => subset.forall(_.contains(n)))
      .filter(n => families.forall(_.exists(n.startsWith)))
      .filter(n => exclude.forall(!_.exists(n.startsWith)))
    // an empty board is always a bug (empty env string, or a subset ∩
    // families intersection that validated per-filter but selects
    // nothing) — fail loudly instead of publishing a zero-query artifact
    require(names.nonEmpty, "no bench queries selected: check " +
      "SPARK_GRAFT_BENCH_QUERIES / SPARK_GRAFT_BENCH_FAMILIES " +
      "(each filter validated individually but their combination is empty)")
    // warm-up pass at the small scale factor
    names.foreach { n =>
      try { execute(n, warmDir); resetCaches() }
      catch { case _: Throwable => resetCaches() }
    }
    // ambient-load sentinels, pre-queries (first run warms the range/
    // noop path; second is the measurement). The BANDWIDTH sentinel is
    // GC-collected immediately before each measurement: it allocates
    // tens of millions of row objects, so inherited heap debt from 100+
    // query warmups inflated it ~6× (r13 board observation) — a
    // yardstick must measure the machine, not the board's GC state.
    sentinelSec(spark)
    val sentinelPre = sentinelSec(spark)
    resetCaches()
    sentinelBwSec(spark)
    resetCaches()
    val sentinelBwPre = sentinelBwSec(spark)
    resetCaches()
    // A query with ANY failed run must NOT report a number (a partial
    // median has no spread protection, and a time-to-crash would read
    // as a speedup): it gets sentinel -1 and an entry in "errors".
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val suspect = scala.collection.mutable.ListBuffer.empty[String]
    val results = names.map { name =>
      val times = (1 to TimedRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        val elapsed =
          try { execute(name, sfDir); Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None }
        // teardown (cache clear, unpersist, GC) happens OUTSIDE the
        // measured interval — it must be charged to no run at all
        resetCaches()
        elapsed
      }
      if (times.size < TimedRuns) { errors += name; name -> -1.0 }
      else {
        val sorted = times.sorted
        if (sorted.last / sorted.head > SuspectSpread) suspect += name
        name -> sorted(sorted.size / 2)
      }
    }
    val sentinelPost = sentinelSec(spark)
    // identical warm+GC+measure protocol as the PRE measurement — the
    // two feed the same max() flag, so they must be like-for-like
    resetCaches()
    sentinelBwSec(spark)
    resetCaches()
    val sentinelBwPost = sentinelBwSec(spark)
    // per-query output row counts (one extra untimed execution each):
    // the pair/candidate-emitting queries' scaling claim ("output-
    // bound, not candidate-quadratic") needs emitted counts next to
    // wall time in the artifact to be self-proving, so those are
    // ALWAYS counted; SPARK_GRAFT_BENCH_ROWS=true extends the count
    // to every benched query (the sfN stress-bench mode).
    val defaultRowCounted = Set("sim_hard_negatives",
      "dedup_winnow_pairs", "dedup_prefix_jaccard",
      "dedup_minhash_pairs", "dedup_simhash_pairs", "sim_knn_graph")
    val rowNames =
      if (sys.env.get("SPARK_GRAFT_BENCH_ROWS").contains("true")) names
      else names.filter(defaultRowCounted)
    val rowsJson = if (rowNames.isEmpty) ""
      else {
        val counts = rowNames.map { name =>
          val n = try SparkEntry.queries(name)(spark, sfDir).count()
            catch { case _: Throwable => -1L }
          resetCaches()
          "\"" + name + "\":" + n
        }
        ",\"rows\":" + counts.mkString("{", ",", "}")
      }
    // millisecond precision keeps the JSON line compact — the driver
    // captures only the trailing ~2000 chars of output, and every byte
    // of a 12-significant-digit double costs board visibility
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sus = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val loaded = math.max(sentinelPre, sentinelPost) > SentinelNominal * 1.25
    val bwLoaded =
      math.max(sentinelBwPre, sentinelBwPost) > BwSentinelNominal * 1.25
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"suspect":$sus,"runs_per_query":$TimedRuns,"sentinel_pre_sec":${ms(sentinelPre)},"sentinel_post_sec":${ms(sentinelPost)},"sentinel_nominal_sec":$SentinelNominal,"ambient_load_suspected":$loaded,"sentinel_bw_pre_sec":${ms(sentinelBwPre)},"sentinel_bw_post_sec":${ms(sentinelBwPost)},"sentinel_bw_nominal_sec":$BwSentinelNominal,"ambient_bw_suspected":$bwLoaded$rowsJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
