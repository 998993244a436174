package graft

import graft.ops.TableOps
import graft.tables.{CommitLog, KeyedTable, TableLock}
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
}
