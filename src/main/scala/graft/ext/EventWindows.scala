package graft.ext

import org.apache.spark.sql.expressions.Window
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

  /** Ordered-step funnel: per user, how far along `steps` an
    * INCREASING-timestamp subsequence of their events reaches (the
    * product-analytics conversion funnel: signup → view → purchase).
    * Greedy-earliest matching — take the first occurrence of step 1,
    * then the first occurrence of step 2 strictly after it, and so
    * on — which is complete (an increasing match exists iff the greedy
    * one does, by the standard exchange argument).
    *
    * Output: one row per user that reached stage ≥ 1, with
    * `stage_reached` and the matched timestamp per step (`t1..tk`,
    * null past the reached stage) — composable (the driver query
    * aggregates it into per-stage counts).
    *
    * Shape at scale: k−1 equi-joins + k aggregations, ALL keyed on the
    * user column — one partitioning reused across every stage, no
    * explode, no per-user event collection (a whale user costs its
    * event count in the per-stage filters, never a buffered array).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be nonempty")
    val u = col(userCol)
    // stage frames: (user, t_i) = earliest step-i event after t_{i-1}
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("t1"))
    val stages = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) =>
        events.filter(col(typeCol) === step)
          .select(u, col(tsCol))
          .join(prev.select(u, col(s"t$i")), Seq(userCol))
          .filter(col(tsCol) > col(s"t$i"))
          .groupBy(u).agg(min(col(tsCol)).as(s"t${i + 1}"))
    }
    // left-join the chain back together: stage_reached = #non-null t_i
    val joined = stages.zipWithIndex.tail.foldLeft(stages.head) {
      case (acc, (st, i)) => acc.join(st, Seq(userCol), "left_outer")
    }
    val tCols = steps.indices.map(i => col(s"t${i + 1}"))
    joined.withColumn("stage_reached",
      tCols.map(t => when(t.isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** First-order Markov transition matrix over per-key event
    * sequences: `(from_state, to_state, n, p)` with `n` the count of
    * consecutive (from → to) pairs inside a key's `orderCols`-ordered
    * stream and `p` the row-normalized probability — the
    * next-event-model / session-flow summary funnels don't express
    * (funnels test ONE named path; this measures every observed
    * transition). Determinism: `orderCols` must be a total order
    * within a key (pass a ts + id tiebreak — a bare tied timestamp
    * would make `lead` order-dependent); `p` is ONE division of two
    * exact counts, bit-stable cross-engine.
    *
    * Scale: one shuffle on the key for the `lead` window (single
    * sorted pass, O(1) state/row), then a map-combinable count on
    * (from, to) — a states²-sized frame — and the normalizing window
    * runs on that frame, never the stream.
    */
  def transitions(events: DataFrame, keyCol: String,
      orderCols: Seq[org.apache.spark.sql.Column],
      stateCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be nonempty")
    // alias the order expressions into the projection so computed
    // orderings (e.g. unix_micros(ts)) survive the column pruning
    val named = orderCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }
    val w = Window.partitionBy(keyCol)
      .orderBy(named.indices.map(i => col(s"_o$i")): _*)
    val wf = Window.partitionBy("from_state")
    events.select(col(keyCol) +: col(stateCol).as("from_state") +:
        named: _*)
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast(DoubleType) / sum(col("n")).over(wf))
  }

  /** Weekly cohort retention: users grouped by the epoch-week of their
    * FIRST event (the cohort), counted distinct in each later week as
    * `(cohort_week, week_offset, n_active)` — the classic retention
    * triangle. Weeks are integer epoch arithmetic
    * (`floor(unix_seconds / 604800)`), not calendar truncation, so the
    * assignment is bit-exact cross-engine and timezone-free. Two
    * shuffles: first-event per user, then the (cohort, offset)
    * distinct count.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val week = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c) / 604800L)
    val firsts = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_first_ts"))
      .select(col(userCol), week(col("_first_ts")).as("cohort_week"))
    events.select(col(userCol), week(col(tsCol)).as("_w"))
      .join(firsts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("_w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }
}
