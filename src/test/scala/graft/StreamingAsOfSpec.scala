package graft

import graft.streaming.StreamingAsOf
import graft.streaming.StreamingFeatures.TransEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Composite-key event shape for the [[StreamingAsOf.asOfEnrichRows]]
  * cases — top-level so the encoder has no outer pointer. */
case class RegionEv(user_id: Long, region: Long, event_id: Long,
    ts: Timestamp, event_type: String)

/** Stream ≡ batch parity for the as-of enrichment operator: the
  * streamed `(probe, matched ref)` pairs must equal the batch
  * [[graft.ops.AsOfJoin]] output — including the left-outer nulls,
  * the inclusive equal-timestamp match, and the tolerance
  * (match-then-null) contract — under adversarial arrival order, and
  * the carried ref row must survive silence to enrich a much-later
  * probe.
  */
class StreamingAsOfSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1700000000L * 1000000L
  private def mkTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }
  private def sentinels(maxUs: Long, delayUs: Long): Seq[(Long, Long)] =
    Seq((maxUs + delayUs + 3600L * 1000000L, -1L),
      (maxUs + delayUs + 7200L * 1000000L, -2L))

  /** 4 users: interleaved views/purchases with sub-second offsets, a
    * purchase BEFORE any view (null match), a view at EXACTLY a
    * purchase's ts (inclusive match), and a decoy type the operator
    * must ignore. */
  private def fixture: Seq[TransEvent] = {
    val m = 60L * 1000000L
    Seq(
      // user 0: view, purchase, view, purchase (normal chain)
      TransEvent(0L, 1L, mkTs(T0), "view"),
      TransEvent(0L, 2L, mkTs(T0 + 2 * m), "purchase"),
      TransEvent(0L, 3L, mkTs(T0 + 3 * m + 123L), "view"),
      TransEvent(0L, 4L, mkTs(T0 + 5 * m), "purchase"),
      // user 1: purchase FIRST (no admissible view -> null), then
      // view at EXACTLY the second purchase's ts (inclusive match)
      TransEvent(1L, 5L, mkTs(T0 + m), "purchase"),
      TransEvent(1L, 6L, mkTs(T0 + 4 * m), "view"),
      TransEvent(1L, 7L, mkTs(T0 + 4 * m), "purchase"),
      // user 2: stale view far before the purchase (tolerance kills)
      TransEvent(2L, 8L, mkTs(T0), "view"),
      TransEvent(2L, 9L, mkTs(T0 + 90 * m), "purchase"),
      // user 3: decoy event type between view and purchase
      TransEvent(3L, 10L, mkTs(T0 + m), "view"),
      TransEvent(3L, 11L, mkTs(T0 + 2 * m), "signup"),
      TransEvent(3L, 12L, mkTs(T0 + 3 * m), "purchase"))
  }

  private def runStream(events: Seq[TransEvent],
      tolerance: Option[Long], qname: String): Set[(Long, Long, Option[Long])] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[TransEvent]
    val out = StreamingAsOf.asOfEnrich(input.toDS(), refType = "view",
      probeType = "purchase", watermarkDelay = "3 hours",
      toleranceMicros = tolerance)
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      // adversarial split: evens then odds — every second arrival out
      // of order, inside the delay
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(qname).filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "ref_event_id")
      .as[(Long, Long, Option[Long])].collect().toSet
  }

  private def runBatch(events: Seq[TransEvent],
      tolerance: Option[Long]): Set[(Long, Long, Option[Long])] = {
    val df = events.toDF()
    val purchases = df.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val views = df.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("vts"), $"event_id".as("ref_event_id"))
    graft.ops.AsOfJoin.asOf(purchases, views, Seq("user_id"),
        leftTime = "ts", rightTime = "vts",
        payload = Seq("ref_event_id"), toleranceMicros = tolerance)
      .select("event_id", "user_id", "ref_event_id")
      .as[(Long, Long, Option[Long])].collect().toSet
  }

  test("streamed as-of pairs equal the batch operator (left-outer, inclusive)") {
    val streamed = runStream(fixture, None, "asof_par")
    val batch = runBatch(fixture, None)
    assert(streamed.nonEmpty && streamed === batch)
    // the semantics the fixture pins, asserted explicitly so a fixture
    // regression can't silently weaken the test:
    assert(streamed.contains((5L, 1L, None)), "probe before any ref is null")
    assert(streamed.contains((7L, 1L, Some(6L))), "equal-ts ref matches (inclusive)")
    assert(streamed.contains((12L, 3L, Some(10L))), "decoy types are ignored")
  }

  test("tolerance nulls the stale match but keeps the probe row") {
    val tol = Some(1800L * 1000000L) // 30 minutes
    val streamed = runStream(fixture, tol, "asof_tol")
    val batch = runBatch(fixture, tol)
    assert(streamed === batch)
    assert(streamed.contains((9L, 2L, None)),
      "match-then-null: the 90-minute-old view must be discarded")
    assert(streamed.contains((4L, 0L, Some(3L))),
      "a fresh match inside the tolerance survives")
  }

  test("the carried ref row survives silence and watermark passage") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val out = StreamingAsOf.asOfEnrich(input.toDS(), refType = "view",
      probeType = "purchase", watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("asof_carry")
      .outputMode("append").start()
    try {
      // ref for user 7, then the watermark passes it by days of
      // unrelated traffic — the key goes quiet with nothing pending
      input.addData(TransEvent(7L, 1L, mkTs(T0), "view"))
      q.processAllAvailable()
      input.addData(TransEvent(99L, 2L, mkTs(T0 + 86400L * 1000000L), "view"))
      q.processAllAvailable()
      // a probe arrives days later: the O(1) carried ref must enrich it
      input.addData(TransEvent(7L, 3L, mkTs(T0 + 2L * 86400L * 1000000L), "purchase"))
      q.processAllAvailable()
      sentinels(T0 + 2L * 86400L * 1000000L, 0L).foreach { case (us, id) =>
        input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("asof_carry").filter($"user_id" === 7L)
      .select("event_id", "ref_event_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(rows === Set((3L, Some(1L))))
  }

  test("ref ties at one timestamp resolve to the greatest event id") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val out = StreamingAsOf.asOfEnrich(input.toDS(), refType = "view",
      probeType = "purchase", watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("asof_tie")
      .outputMode("append").start()
    try {
      input.addData(
        TransEvent(4L, 11L, mkTs(T0), "view"),
        TransEvent(4L, 10L, mkTs(T0), "view"), // same ts, lower id
        TransEvent(4L, 20L, mkTs(T0 + 60L * 1000000L), "purchase"))
      q.processAllAvailable()
      sentinels(T0 + 60L * 1000000L, 3600L * 1000000L).foreach {
        case (us, id) =>
          input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
          q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("asof_tie").filter($"user_id" === 4L)
      .select("event_id", "ref_event_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(rows === Set((20L, Some(11L))))
  }

  test("rows face with a single key equals the typed face") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val maxUs = fixture.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[TransEvent]
    val out = StreamingAsOf.asOfEnrichRows(input.toDS().toDF(),
      keys = Seq("user_id"), refType = "view", probeType = "purchase",
      watermarkDelay = "3 hours")
    val q = out.writeStream.format("memory").queryName("asof_rows1")
      .outputMode("append").start()
    try {
      val (a, b) = fixture.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("asof_rows1").filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "ref_event_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(rows === runBatch(fixture, None))
  }

  test("composite keys partition on ALL key columns (no cross-region enrichment)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000L
    val input = MemoryStream[RegionEv]
    val out = StreamingAsOf.asOfEnrichRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"), refType = "view",
      probeType = "purchase", watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("asof_comp")
      .outputMode("append").start()
    try {
      input.addData(
        // ONE user, two regions: the region-1 purchase precedes any
        // region-1 view, so a user-only grouping would (wrongly)
        // enrich it from the region-0 view
        RegionEv(9L, 0L, 1L, mkTs(T0), "view"),
        RegionEv(9L, 1L, 2L, mkTs(T0 + m), "purchase"),
        RegionEv(9L, 1L, 3L, mkTs(T0 + 2 * m), "view"),
        RegionEv(9L, 0L, 4L, mkTs(T0 + 3 * m), "purchase"),
        RegionEv(9L, 1L, 5L, mkTs(T0 + 4 * m), "purchase"),
        // a second user sharing region 0: must not see user 9's view
        RegionEv(8L, 0L, 6L, mkTs(T0 + 3 * m), "purchase"))
      q.processAllAvailable()
      sentinels(T0 + 4 * m, 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RegionEv(-1L, 0L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("asof_comp").filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "region", "ref_event_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(rows === Set(
      (2L, 9L, 1L, None),       // cross-region view must NOT enrich
      (4L, 9L, 0L, Some(1L)),   // same-region match
      (5L, 9L, 1L, Some(3L)),   // later same-region view matches
      (6L, 8L, 0L, None)))      // cross-user view must NOT enrich
  }

  test("composite tolerance composes unchanged (match-then-null per key)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000L
    val input = MemoryStream[RegionEv]
    val out = StreamingAsOf.asOfEnrichRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"), refType = "view",
      probeType = "purchase", watermarkDelay = "0 seconds",
      toleranceMicros = Some(30L * m))
    val q = out.writeStream.format("memory").queryName("asof_comp_tol")
      .outputMode("append").start()
    try {
      input.addData(
        RegionEv(9L, 0L, 1L, mkTs(T0), "view"),
        RegionEv(9L, 0L, 2L, mkTs(T0 + 90 * m), "purchase"), // stale
        RegionEv(9L, 1L, 3L, mkTs(T0 + 80 * m), "view"),
        RegionEv(9L, 1L, 4L, mkTs(T0 + 95 * m), "purchase")) // fresh
      q.processAllAvailable()
      sentinels(T0 + 95 * m, 0L).foreach { case (us, id) =>
        input.addData(RegionEv(-1L, 0L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("asof_comp_tol").filter($"user_id" =!= -1L)
      .select("event_id", "region", "ref_event_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(rows === Set((2L, 0L, None), (4L, 1L, Some(3L))))
  }
}
