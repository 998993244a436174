package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-time windowing over the `events` stream table — the capability
  * the reference's batch-incremental model lacks entirely (SURVEY.md
  * §2i: no watermarks, no event-time windows; extension mandated by §7).
  * All three window kinds are the built-in `window()`/`session_window()`
  * operators, usable identically in batch and Structured Streaming
  * (see [[graft.streaming.StreamingEtl]] for the streaming variant with
  * watermarks).
  */
object EventWindows {

  /** Tumbling 1-hour windows per event type: count + exact decimal sum.
    * Epoch-aligned, so `window.start == date_trunc('hour', ts)` — which
    * is exactly the SQL oracle.
    */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows (1 h length, 30 min slide): each event lands in 2
    * windows; both epoch-aligned.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user with a 30-minute inactivity gap: window
    * end = last event + gap (Spark session_window semantics). Output is
    * per (user, session): start, n events, exact value sum.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
          .as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n"), col("sum_value"))
}
