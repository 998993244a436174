package graft

import graft.streaming.StreamingFeatures.RollEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Ingestion-dedup contract (`dropDuplicatesWithinWatermark`): a key
  * redelivered in the SAME or a LATER micro-batch inside the
  * watermark horizon emits exactly once — the at-least-once-delivery
  * guard in front of every streaming ingest, with state bounded by
  * the watermark horizon rather than the corpus.
  */
class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1700000000L * 1000000L
  private def mkTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  test("same-batch and cross-batch duplicates emit exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[RollEvent]
    val q = input.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val e1 = RollEvent(1L, 10L, mkTs(T0), 1.0)
      val e2 = RollEvent(2L, 20L, mkTs(T0 + 1000000L), 2.0)
      // batch 1: e1 twice (same-batch dup) + e2
      input.addData(e1, e1, e2); q.processAllAvailable()
      // batch 2: e1 AGAIN (cross-batch redelivery, inside the horizon)
      // plus a fresh event
      input.addData(e1, RollEvent(3L, 30L, mkTs(T0 + 2000000L), 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_stream")
      .select("event_id").as[Long].collect().toSeq.sorted
    assert(out === Seq(10L, 20L, 30L),
      "each key must emit exactly once across redeliveries")
  }
}
