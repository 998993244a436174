package graft.ops

import graft.tables.{KeyedTable, TableLock}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

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
            TableOps.clean(spark, t, retainCommits, archive = true): Unit
            serviced.incrementAndGet()
            true
          }
        } catch {
          case e: Throwable => lastError.set(e); false
        } finally TableLock.release(spark, t, lock): Unit
    }
  }

  /** Start the background scheduler (daemon thread; fixed DELAY, so a
    * slow pass never stacks passes).
    */
  def start(): this.type = synchronized {
    require(exec == null, s"table service for ${t.name} already started")
    exec = Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, s"graft-table-service-${t.name}")
      th.setDaemon(true)
      th
    })
    exec.scheduleWithFixedDelay(() => runOnce(): Unit,
      intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    this
  }

  /** Stop the scheduler, wait for an in-flight pass to finish, and
    * rethrow the last pass error if any pass failed.
    */
  def stop(awaitMs: Long = 30000L): Unit = synchronized {
    if (exec != null) {
      exec.shutdown()
      if (!exec.awaitTermination(awaitMs, TimeUnit.MILLISECONDS))
        exec.shutdownNow(): Unit
      exec = null
    }
    failure.foreach(e => throw new IllegalStateException(
      s"table service for ${t.name} failed during a pass", e))
  }
}
