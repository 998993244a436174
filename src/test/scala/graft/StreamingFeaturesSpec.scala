package graft

import graft.ext.{EventWindows, TimeSeries}
import graft.streaming.StreamingFeatures
import graft.streaming.StreamingFeatures.{RollEvent, TransEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Composite-key event shape for the
  * [[StreamingFeatures.rollingRangeRows]] cases — top-level so the
  * encoder has no outer pointer. */
case class RollRegionEv(user_id: Long, region: Long, event_id: Long,
    ts: Timestamp, value: Double)

/** Stream ≡ batch row-equality for the finalize-on-watermark feature
  * operators, pinned under adversarial arrival order (events split
  * into interleaved chunks, disorder inside the watermark delay) and
  * for the late-drop contract (disorder beyond the delay).
  */
class StreamingFeaturesSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1700000000L * 1000000L // µs epoch base
  private def mkTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  // 3 users, events every ~3 minutes inside a 45-minute span, sub-ms
  // µs parts and a same-timestamp tie pair to exercise range-frame tie
  // semantics
  private def syntheticRoll: Seq[RollEvent] =
    (0 until 45).map { i =>
      RollEvent(user_id = i % 3, event_id = i.toLong,
        ts = mkTs(T0 + i.toLong * 180L * 1000000L + (i % 7) * 123L),
        value = i * 1.2345678 - 11.1)
    } :+ RollEvent(1L, 100L, // exact within-user ts tie with event 16:
      mkTs(T0 + 16L * 180L * 1000000L + (16 % 7) * 123L), 9.87)
  /** Sentinel instants that clear `max + delay` so the watermark
    * passes every real event (first push) and then fires the armed
    * timeouts (second push). */
  private def sentinels(maxUs: Long, delayUs: Long): Seq[(Long, Long)] =
    Seq((maxUs + delayUs + 3600L * 1000000L, -1L),
      (maxUs + delayUs + 7200L * 1000000L, -2L))

  test("streaming rollingRange equals batch under interleaved chunks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = syntheticRoll
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[RollEvent]
    // the delay must bound the DISORDER: Spark's stateful admission
    // gate drops any input row older than the current watermark, and
    // the evens/odds split re-delivers rows up to the full 2.25 h span
    // out of order
    val out = StreamingFeatures.rollingRange(input.toDS(),
      trailingMicros = 600L * 1000000L, watermarkDelay = "3 hours")
    val q = out.writeStream.format("memory").queryName("roll_par")
      .outputMode("append").start()
    try {
      // adversarial split: evens first, odds second — every second
      // arrival is out of order, all inside the delay
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("roll_par").filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = TimeSeries.rollingRange(events.toDF(), "user_id", "ts",
        "value", trailingMicros = 600L * 1000000L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("rolling rows face with a single key equals the typed face") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = syntheticRoll
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[RollEvent]
    val out = StreamingFeatures.rollingRangeRows(input.toDS().toDF(),
      keys = Seq("user_id"), trailingMicros = 600L * 1000000L,
      watermarkDelay = "3 hours")
    val q = out.writeStream.format("memory").queryName("roll_rows1")
      .outputMode("append").start()
    try {
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("roll_rows1").filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = TimeSeries.rollingRange(events.toDF(), "user_id", "ts",
        "value", trailingMicros = 600L * 1000000L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("composite-key rolling windows never mix across regions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000L
    val input = MemoryStream[RollRegionEv]
    val out = StreamingFeatures.rollingRangeRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"),
      trailingMicros = 10L * m, watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("roll_comp")
      .outputMode("append").start()
    try {
      input.addData(
        // ONE user, two regions inside one 10-minute span: a
        // user-only grouping would count all three in event 3's frame
        RollRegionEv(5L, 0L, 1L, mkTs(T0), 1.0),
        RollRegionEv(5L, 0L, 2L, mkTs(T0 + 5 * m), 2.0),
        RollRegionEv(5L, 1L, 3L, mkTs(T0 + 6 * m), 4.0),
        // second user in region 0, same span: must not join user 5's
        RollRegionEv(6L, 0L, 4L, mkTs(T0 + 7 * m), 8.0))
      q.processAllAvailable()
      sentinels(T0 + 7 * m, 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RollRegionEv(-1L, 0L, id, mkTs(us), 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("roll_comp").filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "region", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(rows === Set(
      (1L, 5L, 0L, 1L, 1.0),
      (2L, 5L, 0L, 2L, 3.0),  // same (user, region): window accrues
      (3L, 5L, 1L, 1L, 4.0),  // other region: fresh window
      (4L, 6L, 0L, 1L, 8.0))) // other user, same region: fresh window
  }

  test("streaming rollingRange drops disorder beyond the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[RollEvent]
    val out = StreamingFeatures.rollingRange(input.toDS(),
      trailingMicros = 600L * 1000000L, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("roll_late")
      .outputMode("append").start()
    try {
      input.addData(RollEvent(7L, 1L, mkTs(T0), 1.0))
      q.processAllAvailable()
      // arrives with ts BELOW the watermark (= T0) — conclusively late
      input.addData(RollEvent(7L, 2L, mkTs(T0 - 60L * 1000000L), 5.0))
      q.processAllAvailable()
      sentinels(T0, 0L).foreach { case (us, id) =>
        input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val ids = spark.table("roll_late").filter($"user_id" === 7L)
      .select("event_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("streaming gapFillLocf equals batch under interleaved chunks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // sparse observations with multi-slot gaps: 2 users, 10-minute
    // slots, observations at irregular slot offsets + a within-slot
    // tie pair (same slot, distinct ts)
    val step = 600L * 1000000L
    val offs = Seq(0L, 1L, 5L, 6L, 11L) // slots observed (gaps of 4+)
    val events = (for {
      u <- 0L to 1L
      (o, i) <- offs.zipWithIndex
    } yield RollEvent(u, u * 100 + i,
      mkTs(T0 + o * step + (i % 3) * 47L * 1000000L + u * 999L),
      u * 10.0 + i * 1.5 - 2.0)) :+
      RollEvent(0L, 50L, mkTs(T0 + 5L * step + 300L * 1000000L), 77.7)
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[RollEvent]
    val out = StreamingFeatures.gapFillLocf(input.toDS(), step, "3 hours")
    val q = out.writeStream.format("memory").queryName("gap_par")
      .outputMode("append").start()
    try {
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      // margin must clear delay + slot step so the last slot closes
      sentinels(maxUs, 3L * 3600L * 1000000L + step).foreach {
        case (us, id) =>
          input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
          q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("gap_par").filter($"user_id" =!= -1L)
      .select("user_id", "slot_ts", "value", "is_observed")
      .as[(Long, Timestamp, Double, Boolean)].collect().toSet
    val batch = TimeSeries.gapFillLocf(events.toDF(), "user_id", "ts",
        "value", stepMicros = step)
      .select("user_id", "slot_ts", "value", "is_observed")
      .as[(Long, Timestamp, Double, Boolean)].collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
    // the spine is dense: one row per slot from first (0) to last (11)
    assert(streamed.count(_._1 == 0L) === 12)
    // gap slots carry the LOCF value and are flagged unobserved
    assert(streamed.exists(r => r._1 == 0L && !r._4))
  }

  test("composite-key gap-fill never carries a value across regions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val step = 600L * 1000000L
    val input = MemoryStream[RollRegionEv]
    val out = StreamingFeatures.gapFillLocfRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"), stepMicros = step,
      watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("gap_comp")
      .outputMode("append").start()
    try {
      input.addData(
        // ONE user: region 0 observes slots 0 and 2 (value 1 then 3);
        // region 1 observes slots 1 and 3. A user-only grouping would
        // fill region-0 slot 1 with region-1's value.
        RollRegionEv(5L, 0L, 1L, mkTs(T0), 1.0),
        RollRegionEv(5L, 1L, 2L, mkTs(T0 + step), 20.0),
        RollRegionEv(5L, 0L, 3L, mkTs(T0 + 2 * step), 3.0),
        RollRegionEv(5L, 1L, 4L, mkTs(T0 + 3 * step), 40.0))
      q.processAllAvailable()
      sentinels(T0 + 3 * step, 3600L * 1000000L + step).foreach {
        case (us, id) =>
          input.addData(RollRegionEv(-1L, 0L, id, mkTs(us), 0.0))
          q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("gap_comp").filter($"user_id" =!= -1L)
      .select("region", "slot_ts", "value", "is_observed")
      .as[(Long, Timestamp, Double, Boolean)].collect().toSet
    val s0 = T0 - math.floorMod(T0, step) // slots are epoch-aligned
    assert(rows === Set(
      (0L, mkTs(s0), 1.0, true),
      (0L, mkTs(s0 + step), 1.0, false), // LOCF from region 0, NOT 20.0
      (0L, mkTs(s0 + 2 * step), 3.0, true),
      (1L, mkTs(s0 + step), 20.0, true),
      (1L, mkTs(s0 + 2 * step), 20.0, false), // LOCF from region 1
      (1L, mkTs(s0 + 3 * step), 40.0, true)))
  }

  test("composite-key transitions never chain across regions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000L
    // reuse the as-of composite shape: event_type rides as the state
    val input = MemoryStream[RegionEv]
    val out = StreamingFeatures.transitionsRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"), watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("trans_comp")
      .outputMode("append").start()
    try {
      input.addData(
        // interleaved in TIME across regions: a user-only chain would
        // produce a->x->b->y; per-region chains produce a->b and x->y
        RegionEv(5L, 0L, 1L, mkTs(T0), "a"),
        RegionEv(5L, 1L, 2L, mkTs(T0 + m), "x"),
        RegionEv(5L, 0L, 3L, mkTs(T0 + 2 * m), "b"),
        RegionEv(5L, 1L, 4L, mkTs(T0 + 3 * m), "y"))
      q.processAllAvailable()
      sentinels(T0 + 3 * m, 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RegionEv(-1L, 0L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("trans_comp").filter($"user_id" =!= -1L)
      .select("region", "from_state", "to_state")
      .as[(Long, String, String)].collect().toSet
    assert(rows === Set((0L, "a", "b"), (1L, "x", "y")))
  }

  test("gap-fill and transitions rows faces with a single key equal the typed faces") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val step = 600L * 1000000L
    val offs = Seq(0L, 1L, 5L, 6L, 11L)
    val events = (for {
      u <- 0L to 1L
      (o, i) <- offs.zipWithIndex
    } yield RollEvent(u, u * 100 + i,
      mkTs(T0 + o * step + (i % 3) * 47L * 1000000L + u * 999L),
      u * 10.0 + i * 1.5 - 2.0)) :+
      RollEvent(0L, 50L, mkTs(T0 + 5L * step + 300L * 1000000L), 77.7)
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[RollEvent]
    val out = StreamingFeatures.gapFillLocfRows(input.toDS().toDF(),
      keys = Seq("user_id"), stepMicros = step,
      watermarkDelay = "3 hours")
    val q = out.writeStream.format("memory").queryName("gap_rows1")
      .outputMode("append").start()
    try {
      input.addData(events); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L + step).foreach {
        case (us, id) =>
          input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
          q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("gap_rows1").filter($"user_id" =!= -1L)
      .select("user_id", "slot_ts", "value", "is_observed")
      .as[(Long, Timestamp, Double, Boolean)].collect().toSet
    val batch = TimeSeries.gapFillLocf(events.toDF(), "user_id", "ts",
        "value", stepMicros = step)
      .select("user_id", "slot_ts", "value", "is_observed")
      .as[(Long, Timestamp, Double, Boolean)].collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
    // transitions: the typed-face fixture states via event types
    val tEvents = Seq(
      TransEvent(3L, 1L, mkTs(T0), "a"),
      TransEvent(3L, 2L, mkTs(T0 + step), "b"),
      TransEvent(3L, 3L, mkTs(T0 + 2 * step), "a"),
      TransEvent(4L, 4L, mkTs(T0), "c"))
    val tIn = MemoryStream[TransEvent]
    val tOut = StreamingFeatures.transitionsRows(tIn.toDS().toDF(),
      keys = Seq("user_id"), watermarkDelay = "3 hours")
    val tq = tOut.writeStream.format("memory").queryName("trans_rows1")
      .outputMode("append").start()
    try {
      tIn.addData(tEvents); tq.processAllAvailable()
      sentinels(T0 + 2 * step, 3L * 3600L * 1000000L).foreach {
        case (us, id) =>
          tIn.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
          tq.processAllAvailable()
      }
    } finally tq.stop()
    val tRows = spark.table("trans_rows1").filter($"user_id" =!= -1L)
      .select("user_id", "from_state", "to_state")
      .as[(Long, String, String)].collect().toSet
    assert(tRows === Set((3L, "a", "b"), (3L, "b", "a")))
  }

  test("composite-key funnel advances independently per region") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000L
    val input = MemoryStream[RegionEv]
    val out = StreamingFeatures.funnelRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"),
      steps = Seq("signup", "view", "purchase"),
      watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_comp")
      .outputMode("append").start()
    try {
      input.addData(
        // region 0 runs the full chain; the region-1 view at T0+m
        // must NOT advance region 0's funnel (a user-only grouping
        // would take it as stage 2)
        RegionEv(9L, 0L, 1L, mkTs(T0), "signup"),
        RegionEv(9L, 1L, 2L, mkTs(T0 + m), "view"),
        RegionEv(9L, 0L, 3L, mkTs(T0 + 2 * m), "view"),
        RegionEv(9L, 0L, 4L, mkTs(T0 + 3 * m), "purchase"),
        // region 1 signs up AFTER its view: stage 1 only (the view
        // came before the signup, greedy chain can't use it)
        RegionEv(9L, 1L, 5L, mkTs(T0 + 4 * m), "signup"))
      q.processAllAvailable()
      sentinels(T0 + 4 * m, 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RegionEv(-1L, 0L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("funnel_comp").filter($"user_id" =!= -1L)
      .select("region", "stage")
      .as[(Long, Int)].collect().toSet
    assert(rows === Set((0L, 1), (0L, 2), (0L, 3), (1L, 1)))
  }

  test("composite-key retention cohorts by the key's own first event") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wk = 604800L * 1000000L
    // T0 aligned to a week boundary so offsets are unambiguous
    val t0 = (T0 / wk) * wk
    val c0 = t0 / wk
    val input = MemoryStream[RegionEv]
    val out = StreamingFeatures.cohortRetentionRows(input.toDS().toDF(),
      keys = Seq("user_id", "region"), watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("ret_comp")
      .outputMode("append").start()
    try {
      input.addData(
        // region 0: first event week 0, active again week 2
        RegionEv(9L, 0L, 1L, mkTs(t0), "e"),
        RegionEv(9L, 0L, 2L, mkTs(t0 + 2 * wk), "e"),
        // region 1: FIRST event week 1 — its own cohort, not the
        // user's region-0 cohort (a user-only grouping would report
        // offset 1 of cohort c0)
        RegionEv(9L, 1L, 3L, mkTs(t0 + wk), "e"),
        RegionEv(9L, 1L, 4L, mkTs(t0 + 2 * wk + 1000000L), "e"))
      q.processAllAvailable()
      sentinels(t0 + 2 * wk + 1000000L, 3600L * 1000000L).foreach {
        case (us, id) =>
          input.addData(RegionEv(-1L, 0L, id, mkTs(us), "sentinel"))
          q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("ret_comp").filter($"user_id" =!= -1L)
      .select("region", "cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows === Set(
      (0L, c0, 0L), (0L, c0, 2L),
      (1L, c0 + 1, 0L), (1L, c0 + 1, 1L)))
  }

  test("streaming funnel advances equal the batch greedy-earliest chain") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq("signup", "view", "purchase")
    // user 0: full chain; user 1: purchase BEFORE signup (must not
    // count), then view only; user 2: signup+view at the SAME ts
    // (strict >: view must not advance), later view does; user 3:
    // views only (stage 0)
    val events = Seq(
      TransEvent(0L, 1L, mkTs(T0), "signup"),
      TransEvent(0L, 2L, mkTs(T0 + 60L * 1000000L), "view"),
      TransEvent(0L, 3L, mkTs(T0 + 120L * 1000000L), "purchase"),
      TransEvent(1L, 4L, mkTs(T0), "purchase"),
      TransEvent(1L, 5L, mkTs(T0 + 30L * 1000000L), "signup"),
      TransEvent(1L, 6L, mkTs(T0 + 90L * 1000000L), "view"),
      TransEvent(2L, 7L, mkTs(T0), "signup"),
      TransEvent(2L, 8L, mkTs(T0), "view"),
      TransEvent(2L, 9L, mkTs(T0 + 45L * 1000000L), "view"),
      TransEvent(3L, 10L, mkTs(T0 + 10L * 1000000L), "view"))
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[TransEvent]
    val out = StreamingFeatures.funnel(input.toDS(), steps, "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_par")
      .outputMode("append").start()
    try {
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val advances = spark.table("funnel_par").filter($"user_id" =!= -1L)
      .select("user_id", "stage").as[(Long, Int)].collect().toSet
    assert(advances === Set((0L, 1), (0L, 2), (0L, 3),
      (1L, 1), (1L, 2), (2L, 1), (2L, 2)))
    // and the per-user max stage equals the batch operator
    val batch = EventWindows.funnel(events.toDF(), "user_id",
        "event_type", "ts", steps)
      .select("user_id", "stage_reached").as[(Long, Int)].collect().toMap
    val streamedMax = advances.groupBy(_._1).view
      .mapValues(_.map(_._2).max).toMap
    assert(batch.filter(_._2 > 0) === streamedMax)
  }

  test("streaming cohort retention equals the batch triangle") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val week = 604800L * 1000000L
    // 3 users across 3 weeks; repeat activity inside a week must not
    // double-count; user 2 starts a week later (different cohort)
    val events = Seq(
      TransEvent(0L, 1L, mkTs(T0), "view"),
      TransEvent(0L, 2L, mkTs(T0 + 3600L * 1000000L), "view"), // same wk
      TransEvent(0L, 3L, mkTs(T0 + week + 100L), "view"),
      TransEvent(1L, 4L, mkTs(T0 + 50L), "view"),
      TransEvent(1L, 5L, mkTs(T0 + 2L * week), "view"),
      TransEvent(2L, 6L, mkTs(T0 + week), "view"),
      TransEvent(2L, 7L, mkTs(T0 + 2L * week + 5L), "view"))
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[TransEvent]
    // the evens/odds split re-delivers events up to the full 2-week
    // span out of order, so the delay must cover it (admission gate)
    val out = StreamingFeatures.cohortRetention(input.toDS(), "15 days")
    val q = out.writeStream.format("memory").queryName("ret_par")
      .outputMode("append").start()
    try {
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 15L * 86400L * 1000000L).foreach { case (us, id) =>
        input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("ret_par").filter($"user_id" =!= -1L)
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = EventWindows.cohortRetention(events.toDF(), "user_id",
        "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("rolling features land in a keyed feature table via foreachBatch upsert") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the full live-feature-store composition: stream -> finalized
    // rolling features -> per-batch exactly-once upsert into a keyed
    // table; the final snapshot is row-equal to the batch operator
    val table = graft.tables.KeyedTable("feat_roll",
      tmpDir("graft-featstore"), Seq("event_id"),
      precombineKey = "roll_cnt")
    val events = syntheticRoll
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[RollEvent]
    val out = StreamingFeatures.rollingRange(input.toDS(),
      trailingMicros = 600L * 1000000L, watermarkDelay = "3 hours")
    val q = out.writeStream
      .option("checkpointLocation", tmpDir("graft-featstore-chk"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          StreamingFeatures.RollEmit], batchId: Long) =>
        graft.ops.TableOps.upsert(spark, table, batch.toDF(),
          idempotencyKey = Some(s"feat-roll-$batchId")): Unit
      }
      .outputMode("append").start()
    try {
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val snap = graft.ops.TableOps.snapshot(spark, table)
      .filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = TimeSeries.rollingRange(events.toDF(), "user_id", "ts",
        "value", trailingMicros = 600L * 1000000L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(snap.nonEmpty && snap === batch)
  }

  test("rolling state survives stop/restart from checkpoint, exactly-once") {
    // file source + real checkpoint: q1 processes and EMITS a first
    // tranche, stops; q2 restarts from the checkpoint (state + the
    // persisted watermark), finalizes the rest. The two sinks must
    // partition the batch output — together complete, no row twice.
    val events = syntheticRoll
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val src = tmpDir("graft-restart-src")
    val chk = tmpDir("graft-restart-chk")
    val outDir = tmpDir("graft-restart-out")
    // TIME-ordered split: the mid-stream watermark push finalizes (part
    // of) chunk A, and chunk B — which arrives after the restart — must
    // lie strictly ABOVE that watermark or it would be conclusively
    // late by contract (which is exactly what the late-drop test pins)
    def usOf(e: RollEvent): Long = e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L
    val ordered = events.sortBy(e => (usOf(e), e.event_id))
    val (a, b) = ordered.splitAt(30)
    val maxAUs = a.map(usOf).max
    import org.apache.spark.sql.functions.{lit, timestamp_micros}
    a.toDF().write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    // a FILE sink (unlike memory) supports checkpoint recovery and is
    // exactly-once across restarts via its output manifest
    def start() = StreamingFeatures.rollingRange(
        spark.readStream.schema(schema).parquet(src)
          .as[RollEvent],
        trailingMicros = 600L * 1000000L, watermarkDelay = "3 hours")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", chk)
      .outputMode("append").start()
    val q1 = start()
    try {
      q1.processAllAvailable() // batch 1: watermark 0, all buffered
      // mid-stream push: watermark lands at maxA + 1 s — finalizes
      // chunk A, stays strictly below every chunk-B timestamp
      Seq((-5L, maxAUs + 3L * 3600L * 1000000L + 1000000L))
        .toDF("event_id", "us")
        .select(lit(-1L).as("user_id"), $"event_id",
          timestamp_micros($"us").as("ts"), lit(0.0).as("value"))
        .write.mode("append").parquet(src)
      q1.processAllAvailable()
    } finally q1.stop()
    val firstTranche = spark.read.parquet(outDir)
      .filter($"user_id" =!= -1L)
      .select("event_id").as[Long].collect().toSet
    assert(firstTranche.nonEmpty, "q1 must have emitted before the stop")
    // rest of the data + two finalization pushes land while no query
    // runs; q2 restarts from the checkpoint and drains everything
    b.toDF().write.mode("append").parquet(src)
    val q2 = start()
    try {
      q2.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        Seq((id, us)).toDF("event_id", "us")
          .select(lit(-1L).as("user_id"), $"event_id",
            timestamp_micros($"us").as("ts"), lit(0.0).as("value"))
          .write.mode("append").parquet(src)
        q2.processAllAvailable()
      }
    } finally q2.stop()
    val finalRows = spark.read.parquet(outDir).filter($"user_id" =!= -1L)
      .select("event_id").as[Long].collect().toSeq
    assert(finalRows.size === finalRows.distinct.size,
      "a row emitted before the restart must not re-emit after it")
    val streamed = spark.read.parquet(outDir)
      .filter($"user_id" =!= -1L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = TimeSeries.rollingRange(events.toDF(), "user_id", "ts",
        "value", trailingMicros = 600L * 1000000L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed === batch)
  }

  test("rolling parity holds under the RocksDB state store provider") {
    // the 100 TB state path: HDFS-backed stores hold per-key state on
    // the executor heap; RocksDB spills to local disk. The operators
    // must be provider-agnostic.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val events = syntheticRoll
      val maxUs = events.map(e => e.ts.getTime * 1000L +
        (e.ts.getNanos / 1000L) % 1000L).max
      val input = MemoryStream[RollEvent]
      val out = StreamingFeatures.rollingRange(input.toDS(),
        trailingMicros = 600L * 1000000L, watermarkDelay = "3 hours")
      val q = out.writeStream.format("memory").queryName("roll_rocks")
        .outputMode("append").start()
      try {
        val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
        input.addData(a.map(_._1)); q.processAllAvailable()
        input.addData(b.map(_._1)); q.processAllAvailable()
        sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
          input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("roll_rocks").filter($"user_id" =!= -1L)
        .select("event_id", "user_id", "roll_cnt", "roll_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = TimeSeries.rollingRange(events.toDF(), "user_id", "ts",
          "value", trailingMicros = 600L * 1000000L)
        .select("event_id", "user_id", "roll_cnt", "roll_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed.nonEmpty && streamed === batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming transitions equals batch pairs and report") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val states = Seq("signup", "view", "view", "purchase", "view")
    val events = (0 until 40).map { i =>
      TransEvent(user_id = i % 4, event_id = i.toLong,
        ts = mkTs(T0 + i.toLong * 240L * 1000000L + (i % 5) * 77L),
        event_type = states(i % states.size))
    } :+ TransEvent(2L, 200L, mkTs(T0 + 6L * 240L * 1000000L + 77L),
      "tie_state") // exact-tie ts with event 6 — (ts, id) order decides
    val maxUs = events.map(e => e.ts.getTime * 1000L +
      (e.ts.getNanos / 1000L) % 1000L).max
    val input = MemoryStream[TransEvent]
    // 2.67 h span of disorder under the evens/odds split -> 3 h delay
    val out = StreamingFeatures.transitions(input.toDS(), "3 hours")
    val q = out.writeStream.format("memory").queryName("trans_par")
      .outputMode("append").start()
    try {
      val (a, b) = events.zipWithIndex.partition(_._2 % 2 == 0)
      input.addData(a.map(_._1)); q.processAllAvailable()
      input.addData(b.map(_._1)); q.processAllAvailable()
      sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
        input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamedPairs = spark.table("trans_par")
      .filter($"user_id" =!= -1L)
      .groupBy("user_id", "from_state", "to_state").count()
      .as[(Long, String, String, Long)].collect().toSet
    val batchPairs = events.toDF()
      .select($"user_id", $"event_type".as("from_state"),
        lead($"event_type", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts", "event_id"))
          .as("to_state"))
      .filter($"to_state".isNotNull)
      .groupBy("user_id", "from_state", "to_state").count()
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamedPairs.nonEmpty && streamedPairs === batchPairs)
    // the aggregated report path equals the batch operator
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy("from_state")
    val streamedReport = spark.table("trans_par")
      .filter($"user_id" =!= -1L)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
      .withColumn("p", $"n".cast("double") / sum($"n").over(wf))
      .as[(String, String, Long, Double)].collect().toSet
    val batchReport = EventWindows.transitions(events.toDF(), "user_id",
        Seq(col("ts"), col("event_id")), "event_type")
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamedReport === batchReport)
  }
}
