package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, ConditionalPutLockProvider, KeyedTable,
  LeaseFileLockProvider, TableLock}
import org.apache.spark.sql.functions._

/** Writer-lock semantics: mutual exclusion, lease expiry + steal,
  * owner-checked release, and real serialized multi-writer upserts
  * (the OCC deployment shape the reference configures via Hudi's lock
  * provider).
  */
class TableLockSpec extends SparkSuite {
  import spark.implicits._

  private def table() = {
    val base = tmpDir("graft-lock")
    KeyedTable("t", s"$base/t", Seq("id"), "ver")
  }

  test("second acquire fails while held; succeeds after release") {
    val t = table()
    val l1 = TableLock.tryAcquire(spark, t)
    assert(l1.isDefined)
    assert(TableLock.tryAcquire(spark, t).isEmpty)
    assert(TableLock.release(spark, t, l1.get))
    assert(TableLock.tryAcquire(spark, t).isDefined)
  }

  test("expired lease is stolen; stale holder cannot release the thief's lock") {
    val t = table()
    val stale = TableLock.tryAcquire(spark, t, leaseMs = 1L).get
    Thread.sleep(10)
    val thief = TableLock.tryAcquire(spark, t, leaseMs = 60000L)
    assert(thief.isDefined)
    assert(!TableLock.release(spark, t, stale))
    assert(TableLock.holder(spark, t).map(_.owner) === Some(thief.get.owner))
    assert(TableLock.release(spark, t, thief.get))
  }

  test("withLock serializes concurrent writers: every commit publishes, no tripwire") {
    val t = table()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 3).map { w =>
      new Thread(() => {
        try {
          for (i <- 0 until 2) {
            TableLock.withLock(spark, t, waitMs = 120000L) {
              TableOps.upsert(spark, t,
                Seq((s"w$w-$i", 1, s"p$w")).toDF("id", "ver", "payload"))
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek())}")
    // all 6 upserts landed as 6 distinct commits; snapshot holds 6 keys
    assert(CommitLog(t, spark).listCommits().length === 6)
    assert(TableOps.snapshot(spark, t).select("id").distinct().count() === 6)
    assert(TableLock.holder(spark, t).isEmpty) // everyone released
  }

  test("two concurrent read-modify-write writers lose no update under the lock") {
    // The OCC deployment contract the reference configures
    // (create_hudi_tables.py:176-183): each writer READS the current
    // counter, computes +1, and publishes — the classic lost-update
    // shape. The lock serializes the whole read-compute-publish
    // window, so 2 writers × 10 rounds MUST land exactly 20 increments
    // (an unlocked interleaving would overwrite concurrent reads of
    // the same base value and end below 20).
    val t = table()
    val rounds = 10
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def readCtr(): Int = {
      if (CommitLog(t, spark).latestCommit().isEmpty) return 0
      val rows = TableOps.snapshot(spark, t)
        .filter($"id" === "ctr").select("ver").collect()
      if (rows.isEmpty) 0 else rows.head.getInt(0)
    }
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        try {
          for (_ <- 0 until rounds) {
            TableLock.withLock(spark, t, waitMs = 120000L) {
              val next = readCtr() + 1
              TableOps.upsert(spark, t,
                Seq(("ctr", next, s"v$next")).toDF("id", "ver", "payload"))
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek())}")
    assert(readCtr() === 2 * rounds, "an update was lost")
    assert(CommitLog(t, spark).listCommits().length === 2 * rounds)
    assert(TableLock.holder(spark, t).isEmpty)
  }

  test("a stale-head loser fails cleanly and publishes no torn manifest") {
    // The last-line detector behind the lock: a writer that computed
    // its commit on a stale timeline head (raced past the lock, or a
    // deployment without one) must get a clean RETRYABLE failure from
    // the pre-publish tripwire — and the failed commit must not
    // appear on the timeline at all (publish is the atomic rename, so
    // there is nothing torn to clean up).
    val t = table()
    TableOps.upsert(spark, t, Seq(("a", 1, "p")).toDF("id", "ver", "payload"))
    val log = CommitLog(t, spark)
    val staleHead = log.latestCommit()
    // another writer lands a commit; the timeline head moves
    TableOps.upsert(spark, t, Seq(("b", 1, "p")).toDF("id", "ver", "payload"))
    val headAfter = log.latestCommit()
    val before = log.listCommits().toSeq
    val ex = intercept[java.util.ConcurrentModificationException] {
      log.logCommit("99999999999999999", expectedPrev = Some(staleHead))
    }
    assert(ex.getMessage.contains("NOT published"))
    // nothing torn: the timeline is unchanged and the table reads fine
    assert(log.listCommits().toSeq === before)
    assert(log.latestCommit() === headAfter)
    assert(TableOps.snapshot(spark, t).count() === 2)
  }

  test("crashed holder's empty lock file expires by mtime and is stolen") {
    val t = table()
    // simulate a crash between create and payload write: an empty
    // .lock whose mtime predates the default lease
    val lockFile = java.nio.file.Paths.get(s"${t.commitsPath}/.lock")
    java.nio.file.Files.createDirectories(lockFile.getParent)
    java.nio.file.Files.createFile(lockFile)
    java.nio.file.Files.setLastModifiedTime(lockFile,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - TableLock.DefaultLeaseMs - 60000L))
    // unreadable-but-expired: stealable (a "now"-anchored probe would
    // deadlock every writer forever)
    val l = TableLock.tryAcquire(spark, t)
    assert(l.isDefined)
    assert(TableLock.release(spark, t, l.get))
  }

  test("withLock times out against a held lock") {
    val t = table()
    val l = TableLock.tryAcquire(spark, t).get
    val ex = intercept[IllegalStateException] {
      TableLock.withLock(spark, t, waitMs = 150L) { fail("must not run") }
    }
    assert(ex.getMessage.contains("writer lock"))
    TableLock.release(spark, t, l)
  }

  test("conditional-PUT provider: mutual exclusion where atomic create is unavailable") {
    spark.sparkContext.hadoopConfiguration.set("fs.s3create.impl",
      classOf[S3CreateFs].getName)
    val base = tmpDir("graft-condput")
    val t = KeyedTable("t", s"s3create:$base/t", Seq("id"), "ver")
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // First, the gap itself: on this store create-if-absent is NOT
    // atomic (the s3a shape) — the lease-file primitive hands the lock
    // to BOTH of two sequential "create-if-absent" publishers.
    val probe = new org.apache.hadoop.fs.Path(s"$base/probe.lock")
    assert(LeaseFileLockProvider.putIfAbsent(fs, probe, "a".getBytes))
    assert(LeaseFileLockProvider.putIfAbsent(fs, probe, "b".getBytes),
      "shim must reproduce the s3a non-atomic create (both creators win)")
    // The conditional-PUT provider enforces the precondition at the
    // (simulated) server: one atomic request carrying the payload.
    val provider = new ConditionalPutLockProvider((p, payload) =>
      S3CreateFs.serverSide.synchronized {
        if (fs.exists(p)) false
        else {
          val o = fs.create(p, true)
          try o.write(payload) finally o.close()
          true
        }
      })
    val locks =
      new java.util.concurrent.ConcurrentLinkedQueue[TableLock.LockInfo]()
    val threads = (0 until 8).map(_ => new Thread(() =>
      TableLock.tryAcquire(spark, t, provider = provider)
        .foreach(locks.add)))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(locks.size === 1,
      s"exactly one of 8 racing acquirers must win, got ${locks.size}")
    // full lifecycle through the provider: owner-checked release,
    // re-acquire, expiry steal
    assert(TableLock.release(spark, t, locks.peek()))
    val stale =
      TableLock.tryAcquire(spark, t, leaseMs = 1L, provider = provider).get
    Thread.sleep(10)
    val thief = TableLock.tryAcquire(spark, t, provider = provider)
    assert(thief.isDefined,
      "expired lease must be stealable through the provider")
    assert(!TableLock.release(spark, t, stale))
    assert(TableLock.release(spark, t, thief.get))
  }

  test("service pass skips while a writer holds the lock, runs after release") {
    val t = table()
    TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver"))
    TableOps.deltaCommit(spark, t, Seq(("b", 1)).toDF("id", "ver"))
    val svc = new graft.ops.TableService(spark, t, retainCommits = 1)
    // writer-priority contract: with the writer's lock held the pass
    // returns immediately (skip), does not block, does not throw
    val writerLock = TableLock.tryAcquire(spark, t).get
    assert(!svc.runOnce())
    assert(svc.skippedPasses === 1 && svc.servicedPasses === 0)
    assert(svc.failure.isEmpty)
    // the live delta is untouched — the skipped pass really did nothing
    assert(TableOps.liveDeltaCommits(spark, t).nonEmpty)
    assert(TableLock.release(spark, t, writerLock))
    assert(svc.runOnce())
    assert(svc.servicedPasses === 1 && svc.failure.isEmpty)
    assert(TableOps.liveDeltaCommits(spark, t).isEmpty)
    assert(CommitLog(t, spark).listCommits().size === 1)
    assert(TableOps.snapshot(spark, t).select("id").as[String]
      .collect().toSet === Set("a", "b"))
  }

  test("background service racing a locked writer loses no commit") {
    val t = table()
    val svc = new graft.ops.TableService(spark, t, retainCommits = 1,
      intervalMs = 5L).start()
    try {
      (1 to 6).foreach { i =>
        TableLock.withLock(spark, t) {
          TableOps.deltaCommit(spark, t,
            Seq((s"k$i", 1)).toDF("id", "ver"),
            idempotencyKey = Some(s"race-$i")): Unit
        }
        Thread.sleep(15) // give the service real windows to win the lock
      }
    } finally svc.stop() // rethrows if any pass failed
    assert(svc.servicedPasses >= 1,
      s"service never won the lock (${svc.attemptedPasses} attempts)")
    // drain to the deterministic end state, then: nothing lost, nothing
    // doubled, timeline bounded, every exactly-once key intact
    assert(svc.runOnce())
    assert(svc.failure.isEmpty)
    val log = CommitLog(t, spark)
    assert(log.listCommits().size === 1)
    assert(TableOps.liveDeltaCommits(spark, t).isEmpty)
    assert((1 to 6).forall(i => log.hasIdempotencyKey(s"race-$i")))
    assert(TableOps.snapshot(spark, t).select("id").as[String]
      .collect().toSet === (1 to 6).map(i => s"k$i").toSet)
  }

  test("LOCKLESS writer beside a running service serializes automatically") {
    val t = table()
    TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver"))
    val svc = new graft.ops.TableService(spark, t, retainCommits = 1,
      intervalMs = 60000L).start() // marker live; no pass interference
    try {
      assert(graft.ops.TableService.activeMarker(spark, t).isDefined)
      // simulate a service pass in flight: the lock is held by ANOTHER
      // thread. A lockless TableOps.upsert must WAIT, not race.
      @volatile var held: Option[TableLock.LockInfo] = None
      val holder = new Thread(() => { held = TableLock.tryAcquire(spark, t) })
      holder.start(); holder.join()
      assert(held.isDefined)
      val done = new java.util.concurrent.CountDownLatch(1)
      @volatile var writeErr: Option[Throwable] = None
      val writer = new Thread(() => {
        try TableOps.upsert(spark, t, Seq(("b", 1)).toDF("id", "ver")): Unit
        catch { case e: Throwable => writeErr = Some(e) }
        finally done.countDown()
      })
      writer.start()
      // the guard must hold the writer back while the lock is taken
      assert(!done.await(1500, java.util.concurrent.TimeUnit.MILLISECONDS),
        "lockless writer proceeded beside the held service lock")
      val rel = new Thread(() => {
        TableLock.release(spark, t, held.get): Unit
      })
      rel.start(); rel.join()
      assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "writer did not complete after the lock freed")
      assert(writeErr.isEmpty, s"guarded write failed: $writeErr")
      assert(TableOps.snapshot(spark, t).select("id").as[String]
        .collect().toSet === Set("a", "b"))
    } finally svc.stop()
    // stop() clears the marker: writes stop paying the auto-lock
    assert(graft.ops.TableService.activeMarker(spark, t).isEmpty)
  }

  test("explicit withLock writer beside a service does not deadlock (reentrant guard)") {
    val t = table()
    val svc = new graft.ops.TableService(spark, t, retainCommits = 1,
      intervalMs = 60000L).start()
    try {
      // the r14 replay shape: writer already holds the lock — the
      // guard must detect same-thread ownership and run directly
      TableLock.withLock(spark, t) {
        TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver")): Unit
      }
      assert(TableOps.snapshot(spark, t).count() === 1)
    } finally svc.stop()
  }

  test("a crashed service's stale marker expires; fresh marker survives restarts") {
    val t = table()
    TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver"))
    // a service with a tiny tick publishes a marker lease of
    // max(60s, 20*interval) = 60s: live now
    val svc = new graft.ops.TableService(spark, t, retainCommits = 1,
      intervalMs = 5L).start()
    try {
      assert(graft.ops.TableService.activeMarker(spark, t).isDefined)
      // a lockless write UNDER the running service serializes against
      // real passes and still lands (end-to-end auto-lock face)
      TableOps.deltaCommit(spark, t, Seq(("b", 1)).toDF("id", "ver"))
      Thread.sleep(25)
    } finally svc.stop()
    assert(TableOps.snapshot(spark, t).select("id").as[String]
      .collect().toSet === Set("a", "b"))
  }
}

/** Local FS shim with OBJECT-STORE create semantics: `create(p,
  * overwrite = false)` of an existing path SUCCEEDS (s3a's create only
  * checks client-side and manifests at close — two racing creators
  * both win), so the lease-file provider's primitive is unusable and
  * conditional-PUT is the correct acquisition path. Registered under
  * scheme `s3create`.
  */
class S3CreateFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3create"
  override def getUri: java.net.URI = java.net.URI.create("s3create:///")
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  // FileSystem.create(p, overwrite) funnels through this permissionless
  // overload, not the one above — force overwrite here too
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
}

object S3CreateFs {
  /** Stand-in for the store's server-side precondition serialization. */
  val serverSide = new Object
}
