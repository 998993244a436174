package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Lease-based writer lock for a [[KeyedTable]] — the engine's analog
  * of the OCC lock provider the reference enables alongside metadata
  * indexing (`hoodie.write.concurrency.mode=OPTIMISTIC_CONCURRENCY_
  * CONTROL` + `InProcessLockProvider`, AirflowHudiLabs/Lab2/jobs/
  * python/create_hudi_tables.py:176-183).
  *
  * The engine's commit protocol is already race-DETECTING (the
  * `expectedPrev` tripwire in [[CommitLog.logCommit]] refuses to
  * publish a commit computed on a stale timeline head); this lock makes
  * multi-writer deployments race-FREE by serializing the whole
  * compute-and-publish window:
  *
  * {{{
  * TableLock.withLock(spark, table) {
  *   TableOps.upsert(spark, table, batch)
  * }
  * }}}
  *
  * Mechanism: one lock file at `.commits/.lock`, acquired with atomic
  * create-if-absent — java.nio `createFile` (O_EXCL) for `file://`
  * paths (Hadoop's local connector fakes `create(p, overwrite=false)`
  * with a non-atomic exists()+truncate), the connector's atomic create
  * elsewhere (HDFS). The file carries
  * `owner uuid | acquired-at | lease-ms`; a holder that dies without
  * releasing is STOLEN once its lease expires (expiry judged by the
  * payload's clock fields — or the file's mtime when the payload never
  * landed — so wall-clock skew between writers should stay well under
  * the lease).
  *
  * Object-store caveat (same one Hudi documents): S3's `create` is not
  * atomic-if-absent through s3a, so two racing acquirers can both
  * think they won. The acquisition PRIMITIVE is therefore pluggable
  * ([[LockProvider]]): the default [[LeaseFileLockProvider]] covers
  * POSIX/HDFS, and [[ConditionalPutLockProvider]] carries the
  * precondition server-side for stores whose PUT supports if-absent
  * (S3 `If-None-Match: *`, GCS generation-match 0, ABFS ETag) — the
  * payload rides in one atomic request, so there is no create/write
  * window at all. Deployments without either (or with doubts) keep the
  * commit tripwire as the last-line detector in all cases.
  */
/** The acquisition primitive a deployment plugs into [[TableLock]]:
  * atomically publish `payload` at `p` IFF nothing exists there.
  * Returning true means this caller owns the lock file; false means it
  * lost the race (a normal, retryable outcome). Everything else —
  * lease bookkeeping, expiry stealing, owner-checked release, the
  * post-acquire confirm — is provider-independent and stays in
  * [[TableLock]].
  */
trait LockProvider {
  def putIfAbsent(fs: FileSystem, p: Path, payload: Array[Byte]): Boolean
}

/** Default provider: an atomic create-if-absent followed by the payload
  * write. Correct wherever create-if-absent is truly atomic — POSIX
  * (java.nio O_EXCL; Hadoop's local connector fakes
  * `create(p, overwrite=false)` with a non-atomic exists()+truncate,
  * so `file://` bypasses it) and HDFS (atomic namenode create). NOT
  * correct on s3a-style object stores, where `create` only manifests
  * at close() and two racing creators both succeed — use
  * [[ConditionalPutLockProvider]] there.
  */
object LeaseFileLockProvider extends LockProvider {
  def putIfAbsent(fs: FileSystem, p: Path, payload: Array[Byte]): Boolean = {
    val created =
      try {
        if ("file" == fs.getUri.getScheme) {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(p.toUri.getPath))
          true
        } else {
          fs.create(p, false).close() // atomic create-if-absent
          true
        }
      } catch {
        case _: java.io.IOException |
             _: java.nio.file.FileAlreadyExistsException =>
          false // lost the race
      }
    if (!created) return false
    // Write the payload into OUR file. A failure here (disk full,
    // interrupt) must not leave an empty lock squatting the table:
    // best-effort delete before reporting failure.
    try {
      val out = fs.create(p, true)
      try out.write(payload) finally out.close()
      true
    } catch {
      case e: Exception =>
        try fs.delete(p, false) catch { case _: Exception => () }
        throw e
    }
  }
}

/** Provider for object stores whose PUT carries an if-absent
  * precondition server-side — S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`, ABFS ETag `*` — where the whole
  * publish-if-absent is ONE atomic request with the payload in it (no
  * create/write window, no client-side exists() race). The Hadoop
  * connectors do not surface the precondition through
  * `FileSystem.create`, so the deployment supplies the store-client
  * call: `put(p, payload)` must issue the conditional request and
  * return false on a precondition failure (HTTP 412 / 409). The
  * filesystem is still used for reads, expiry stealing, and release —
  * only acquisition goes through the client.
  */
final class ConditionalPutLockProvider(
    put: (Path, Array[Byte]) => Boolean) extends LockProvider {
  def putIfAbsent(fs: FileSystem, p: Path, payload: Array[Byte]): Boolean =
    put(p, payload)
}

object TableLock {

  final case class LockInfo(owner: String, acquiredMs: Long, leaseMs: Long) {
    def expired(nowMs: Long): Boolean = nowMs - acquiredMs > leaseMs
  }

  private def lockPath(t: KeyedTable): Path =
    new Path(s"${t.commitsPath}/.lock")

  /** JVM-local registry of locks held THROUGH this object, keyed by
    * lock path and stamped with the acquiring THREAD id — what lets
    * the service-guard ([[graft.ops.TableOps]]) auto-lock a writer
    * beside a running [[graft.ops.TableService]] without deadlocking
    * the code that already holds the lock on the current thread (the
    * service's own housekeeping pass, or a writer inside an explicit
    * `withLock`). Thread-scoped on purpose: a DIFFERENT thread of the
    * same process observing "locked by us" must still wait — that
    * other thread's critical section is exactly the race the lock
    * exists to serialize. Contract: hold the lock on the thread that
    * writes.
    */
  private val heldLocal =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  def heldByCurrentThread(t: KeyedTable): Boolean =
    Option(heldLocal.get(lockPath(t).toString))
      .exists(_._2 == Thread.currentThread().getId)

  private def fsOf(spark: SparkSession, t: KeyedTable): FileSystem =
    new Path(t.path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current lock file, if present and parseable. An unreadable or
    * empty payload (a holder that crashed between create and write, or
    * one mid-write) counts as a lock acquired at the FILE'S OWN
    * modification time with the default lease — anchored to a stable
    * clock so it EXPIRES like any other lock (stamping it "now" on
    * every probe would mint an unstealable lock and deadlock all
    * writers forever after a crash in the create-write window).
    */
  def holder(spark: SparkSession, t: KeyedTable): Option[LockInfo] = {
    val fs = fsOf(spark, t)
    val p = lockPath(t)
    if (!fs.exists(p)) return None
    val parsed =
      try {
        val in = fs.open(p)
        val raw =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8)
          finally in.close()
        raw.split('|') match {
          case Array(o, a, l) => Some(LockInfo(o, a.toLong, l.toLong))
          case _ => None
        }
      } catch { case _: Exception => None }
    parsed.orElse {
      try Some(LockInfo("<unreadable>",
        fs.getFileStatus(p).getModificationTime, DefaultLeaseMs))
      catch { case _: Exception => None } // deleted between probes
    }
  }

  val DefaultLeaseMs: Long = 5 * 60 * 1000L

  /** One shot: acquire or return None. Steals an expired holder's lock
    * (delete + re-race the provider's atomic publish — losing the
    * re-race is a normal None).
    */
  def tryAcquire(spark: SparkSession, t: KeyedTable,
      leaseMs: Long = DefaultLeaseMs,
      provider: LockProvider = LeaseFileLockProvider): Option[LockInfo] = {
    val fs = fsOf(spark, t)
    val p = lockPath(t)
    holder(spark, t) match {
      case Some(h) if !h.expired(System.currentTimeMillis()) => return None
      case Some(h) =>
        // Expired — steal. Re-read immediately before the delete: the
        // holder may have released and ANOTHER writer acquired in the
        // meantime; deleting that fresh lock would hand out two locks.
        // (A TOCTOU sliver remains between this check and the delete —
        // wall-clock lease expiry is inherently advisory; the commit
        // tripwire stays as the hard detector.)
        holder(spark, t) match {
          case Some(h2) if h2.owner == h.owner && h2.acquiredMs == h.acquiredMs =>
            fs.delete(p, false)
          case _ => return None
        }
      case None => ()
    }
    val me = LockInfo(java.util.UUID.randomUUID().toString,
      System.currentTimeMillis(), leaseMs)
    val payload = s"${me.owner}|${me.acquiredMs}|${me.leaseMs}"
      .getBytes(StandardCharsets.UTF_8)
    fs.mkdirs(p.getParent)
    if (!provider.putIfAbsent(fs, p, payload)) return None
    // Confirm we still own it. Closes most of the double-steal window
    // (a second stealer whose delete raced in between clobbered our
    // file — exactly one of us sees its own uuid) and covers providers
    // whose publish is two-phase.
    if (holder(spark, t).exists(_.owner == me.owner)) {
      heldLocal.put(p.toString, (me.owner, Thread.currentThread().getId))
      Some(me)
    } else None
  }

  /** Release a lock WE hold. Refuses (false) when the file now carries
    * a different owner — a stolen-after-expiry lock must not clobber
    * the thief.
    */
  def release(spark: SparkSession, t: KeyedTable, lock: LockInfo): Boolean = {
    val fs = fsOf(spark, t)
    // clear OUR registration only (matched by owner uuid): after a
    // lease-expiry steal the registry holds the THIEF's entry, and a
    // stale holder's late release must not erase it — the thief's
    // in-flight guarded write still depends on heldByCurrentThread
    // (review r15 finding)
    heldLocal.computeIfPresent(lockPath(t).toString,
      (_, v) => if (v._1 == lock.owner) null else v)
    holder(spark, t) match {
      case Some(h) if h.owner == lock.owner =>
        fs.delete(lockPath(t), false)
      case _ => false
    }
  }

  /** Acquire (waiting up to `waitMs`, polling with backoff), run
    * `body`, release. Throws IllegalStateException on acquisition
    * timeout. The body must finish within the lease or a waiting
    * writer may steal the lock mid-commit — size `leaseMs` to the
    * workload (the tripwire still catches the resulting race).
    */
  def withLock[A](spark: SparkSession, t: KeyedTable,
      leaseMs: Long = DefaultLeaseMs, waitMs: Long = 60000L,
      provider: LockProvider = LeaseFileLockProvider)(body: => A): A = {
    val deadline = System.currentTimeMillis() + waitMs
    var backoff = 20L
    var lock: Option[LockInfo] = tryAcquire(spark, t, leaseMs, provider)
    while (lock.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(backoff + scala.util.Random.nextLong(backoff))
      backoff = math.min(backoff * 2, 1000L)
      lock = tryAcquire(spark, t, leaseMs, provider)
    }
    val l = lock.getOrElse(throw new IllegalStateException(
      s"table ${t.name}: could not acquire writer lock within ${waitMs}ms " +
        s"(held by ${holder(spark, t).map(_.owner).getOrElse("<gone>")})"))
    try body
    finally release(spark, t, l)
  }
}
