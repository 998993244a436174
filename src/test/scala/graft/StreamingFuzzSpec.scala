package graft

import graft.ext.TimeSeries
import graft.streaming.{StreamingAsOf, StreamingFeatures}
import graft.streaming.StreamingFeatures.{RollEvent, TransEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Seeded randomized stream ≡ batch parity: the handcrafted fixtures
  * pin the named boundary cases; this spec drives the same operators
  * with seeded random event sets, arrival orders, and chunkings
  * (disorder inside the watermark delay, so every event is
  * admissible) and demands exact batch parity every time. Seeds are
  * fixed — failures reproduce.
  */
class StreamingFuzzSpec extends SparkSuite {
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

  /** Random events over `users` keys inside a 2-hour span; per-user
    * timestamps are DISTINCT (engine-arbitrary tie order between two
    * reference rows is not part of the parity contract — the tie rule
    * has its own pinned spec). */
  private def randomEvents(seed: Long, n: Int, users: Int,
      types: Seq[String]): Seq[TransEvent] = {
    val rnd = new scala.util.Random(seed)
    val perUser = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    (1 to n).map { i =>
      val u = rnd.nextInt(users).toLong
      var off = 0L
      do { off = rnd.nextLong(7200L * 1000000L) }
      while (perUser(u).contains(off))
      perUser(u) = perUser(u) + off
      TransEvent(u, i.toLong, mkTs(T0 + off),
        types(rnd.nextInt(types.size)))
    }
  }

  private def chunked[T](seed: Long, xs: Seq[T], chunks: Int): Seq[Seq[T]] = {
    val rnd = new scala.util.Random(seed * 31 + 7)
    val shuffled = rnd.shuffle(xs)
    val size = math.max(1, (shuffled.size + chunks - 1) / chunks)
    shuffled.grouped(size).toSeq
  }

  test("as-of enrichment: random events, orders, chunkings equal batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for ((seed, tol) <- Seq((11L, None), (12L, Some(900L * 1000000L)),
        (13L, None))) {
      val events = randomEvents(seed, 200, 6,
        Seq("view", "purchase", "click"))
      val maxUs = events.map(e => e.ts.getTime * 1000L +
        (e.ts.getNanos / 1000L) % 1000L).max
      val input = MemoryStream[TransEvent]
      val qname = s"asof_fuzz_$seed"
      val q = StreamingAsOf.asOfEnrich(input.toDS(), "view", "purchase",
          watermarkDelay = "3 hours", toleranceMicros = tol)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try {
        chunked(seed, events, 4).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
          input.addData(TransEvent(-1L, id, mkTs(us), "sentinel"))
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table(qname).filter($"user_id" =!= -1L)
        .select("event_id", "user_id", "ref_event_id")
        .as[(Long, Long, Option[Long])].collect().toSet
      val df = events.toDF()
      val batch = graft.ops.AsOfJoin.asOf(
          df.filter($"event_type" === "purchase")
            .select($"user_id", $"event_id", $"ts"),
          df.filter($"event_type" === "view")
            .select($"user_id", $"ts".as("vts"),
              $"event_id".as("ref_event_id")),
          Seq("user_id"), "ts", "vts", Seq("ref_event_id"),
          toleranceMicros = tol)
        .select("event_id", "user_id", "ref_event_id")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(streamed === batch, s"seed=$seed tol=$tol")
    }
  }

  test("rollingRange: random events, orders, chunkings equal batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (seed <- Seq(21L, 22L)) {
      val rnd = new scala.util.Random(seed * 97 + 1)
      val events = randomEvents(seed, 150, 5, Seq("x")).map(e =>
        RollEvent(e.user_id, e.event_id, e.ts,
          math.round(rnd.nextDouble() * 1e6) / 1e4))
      val maxUs = events.map(e => e.ts.getTime * 1000L +
        (e.ts.getNanos / 1000L) % 1000L).max
      val input = MemoryStream[RollEvent]
      val qname = s"roll_fuzz_$seed"
      val q = StreamingFeatures.rollingRange(input.toDS(),
          trailingMicros = 600L * 1000000L, watermarkDelay = "3 hours")
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try {
        chunked(seed, events, 5).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        sentinels(maxUs, 3L * 3600L * 1000000L).foreach { case (us, id) =>
          input.addData(RollEvent(-1L, id, mkTs(us), 0.0))
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table(qname).filter($"user_id" =!= -1L)
        .select("event_id", "user_id", "roll_cnt", "roll_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = TimeSeries.rollingRange(events.toDF(), "user_id",
          "ts", "value", trailingMicros = 600L * 1000000L)
        .select("event_id", "user_id", "roll_cnt", "roll_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed === batch, s"seed=$seed")
    }
  }
}
