package graft

import graft.ext.TimeSeries
import org.apache.spark.sql.functions._

/** TimeSeries: the range frame includes exactly [ts − T, ts] (both
  * edges), duplicate timestamps share a frame, gap-fill emits a dense
  * spine with LOCF and flags observed slots.
  */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private val M = 1000000L // micros per second

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * M))
      .drop("sec")

  test("trailing range includes both edges and resets past the horizon") {
    val df = ev(Seq(
      (1L, 1L, 0L, 1.0),
      (2L, 1L, 3600L, 2.0),   // exactly 1h later: edge INCLUDED
      (3L, 1L, 7201L, 4.0),   // 3601s after event 2: event 2 excluded
      (4L, 2L, 3600L, 8.0)))  // other user: independent
    val out = TimeSeries.rollingRange(df, "user_id", "ts", "value",
        trailingMicros = 3600L * M)
      .select("event_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Double)].collect()
      .map { case (id, c, s) => id -> ((c, s)) }.toMap
    assert(out(1L) === ((1L, 1.0)))
    assert(out(2L) === ((2L, 3.0)))
    assert(out(3L) === ((1L, 4.0)))
    assert(out(4L) === ((1L, 8.0)))
  }

  test("duplicate timestamps share one range frame") {
    val df = ev(Seq(
      (1L, 1L, 100L, 1.0),
      (2L, 1L, 100L, 2.0))) // same ts: both frames see both rows
    val out = TimeSeries.rollingRange(df, "user_id", "ts", "value", 60L * M)
      .select("event_id", "roll_cnt", "roll_sum")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(out === Seq((1L, 2L, 3.0), (2L, 2L, 3.0)))
  }

  test("gap-fill emits the dense spine, LOCF carries across gaps") {
    val day = 86400L
    val df = ev(Seq(
      (1L, 1L, 0L, 5.0),          // day 0
      (2L, 1L, 3 * day + 7L, 9.0), // day 3 (days 1-2 are gaps)
      (3L, 2L, day, 7.0)))         // single-observation user
    val out = TimeSeries.gapFillLocf(df, "user_id", "ts", "value", day * M)
      .select(col("user_id"), unix_micros(col("slot_ts")) / (day * M),
        col("value"), col("is_observed"))
      .as[(Long, Double, Double, Boolean)].collect().toSeq.sorted
    assert(out === Seq(
      (1L, 0.0, 5.0, true),
      (1L, 1.0, 5.0, false),
      (1L, 2.0, 5.0, false),
      (1L, 3.0, 9.0, true),
      (2L, 1.0, 7.0, true)))
  }

  test("within-slot representative is latest ts, value tiebreak") {
    val day = 86400L
    val df = ev(Seq(
      (1L, 1L, 10L, 1.0),
      (2L, 1L, 20L, 2.0),  // later ts wins the slot
      (3L, 1L, 20L, 3.0))) // ts tie: larger value wins
    val out = TimeSeries.gapFillLocf(df, "user_id", "ts", "value", day * M)
      .select("value").as[Double].collect().toSeq
    assert(out === Seq(3.0))
  }
}
