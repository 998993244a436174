package graft.streaming

import graft.streaming.StreamingFeatures._
import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Operator-level watermark-boundary contract, pinned by driving the
  * step functions directly with a fake GroupState (Spark's own
  * admission gate sits in front of them in a real stream, so the
  * boundary row `ts == wm` cannot be injected end-to-end: the 4.1.2
  * gate drops `ts <= wm`, verified against the shipped bytecode).
  * The step functions must be correct under EITHER gate convention —
  * the documented guarantee only promises rows strictly below the
  * watermark are conclusively late, so a row AT the watermark may be
  * delivered by a future Spark (or a different provider) and must
  * never be silently lost:
  *   1. a row with ts == wm is NOT finalized in that invocation
  *      (strict-below emission) and stays pending;
  *   2. a row with ts == the emitted frontier arriving later is
  *      admitted, not dropped (inclusive frontier filter);
  *   3. once the watermark strictly passes it, the row emits exactly
  *      once.
  */
class StreamStepBoundarySpec extends AnyFunSuite {

  /** Minimal in-memory GroupState — only the members the step
    * functions touch (getOption/update/remove/watermark/timeout). */
  private final class FakeState[S](var opt: Option[S], wmMs: Long)
      extends GroupState[S] {
    var timeoutMs: Option[Long] = None
    override def exists: Boolean = opt.isDefined
    override def get: S = opt.get
    override def getOption: Option[S] = opt
    override def update(s: S): Unit = opt = Some(s)
    override def remove(): Unit = opt = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit =
      throw new UnsupportedOperationException
    override def setTimeoutDuration(duration: String): Unit =
      throw new UnsupportedOperationException
    override def setTimeoutTimestamp(timestampMs: Long): Unit =
      timeoutMs = Some(timestampMs)
    override def setTimeoutTimestamp(timestampMs: Long,
        additionalDuration: String): Unit =
      throw new UnsupportedOperationException
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit =
      throw new UnsupportedOperationException
    override def setTimeoutTimestamp(timestamp: java.sql.Date,
        additionalDuration: String): Unit =
      throw new UnsupportedOperationException
    override def getCurrentWatermarkMs(): Long = wmMs
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private val T0 = 1700000000L * 1000000L // µs, whole-second aligned
  private def mkTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }
  private val trailing = 600L * 1000000L

  test("rollStep: a row AT the watermark stays pending, then emits exactly once") {
    // invocation 1: wm == T0, row at exactly T0 delivered
    val st1 = new FakeState[RollState](None, T0 / 1000L)
    val out1 = StreamingFeatures.rollStep(trailing)(5L,
      Iterator(RollEvent(5L, 1L, mkTs(T0), 1.5)), st1).toSeq
    assert(out1.isEmpty, "ts == wm must not finalize (strict below)")
    assert(st1.opt.exists(_.buf.exists(_.id == 1L)),
      "the boundary row must stay buffered, not be dropped")
    assert(st1.opt.exists(_.frontierUs == T0))
    assert(st1.timeoutMs.nonEmpty, "a pending row must arm a re-fire")
    // invocation 2: a SECOND row arrives with ts == the emitted
    // frontier (the exact ADVICE scenario) — must be admitted
    val st2 = new FakeState[RollState](st1.opt, T0 / 1000L)
    val out2 = StreamingFeatures.rollStep(trailing)(5L,
      Iterator(RollEvent(5L, 2L, mkTs(T0), 2.5)), st2).toSeq
    assert(out2.isEmpty)
    assert(st2.opt.exists(_.buf.count(_.tsUs == T0) == 2),
      "a row at the frontier must be admitted, not filtered")
    // invocation 3: watermark strictly passes — both rows finalize
    // once, and each sees the other inside its trailing frame
    val st3 = new FakeState[RollState](st2.opt, T0 / 1000L + 1000L)
    val out3 = StreamingFeatures.rollStep(trailing)(5L,
      Iterator.empty, st3).toSeq
    assert(out3.map(_.event_id).sorted == Seq(1L, 2L))
    assert(out3.forall(_.roll_cnt == 2L),
      "same-ts rows share the inclusive trailing frame")
    assert(out3.forall(e => math.abs(e.roll_sum - 4.0) < 1e-9))
    // invocation 4: nothing re-emits after the frontier passed
    val st4 = new FakeState[RollState](st3.opt, T0 / 1000L + 2000L)
    val out4 = StreamingFeatures.rollStep(trailing)(5L,
      Iterator.empty, st4).toSeq
    assert(out4.isEmpty, "no double emission after finalization")
  }

  test("asOfStep: boundary rows defer; ref-before-probe at equal ts; carry persists") {
    def ev(id: Long, us: Long, tpe: String) =
      StreamingFeatures.TransEvent(5L, id, mkTs(us), tpe)
    val step = StreamingAsOf.asOfStep("view", None) _
    // invocation 1: ref and probe both AT the watermark — neither
    // finalizes (strict below), both stay pending
    val st1 = new FakeState[StreamingAsOf.AsOfState](None, T0 / 1000L)
    val out1 = step(5L, Iterator(ev(1L, T0, "view"),
      ev(2L, T0, "purchase")), st1).toSeq
    assert(out1.isEmpty)
    assert(st1.opt.exists(_.pending.size == 2))
    assert(st1.timeoutMs.nonEmpty)
    // invocation 2: watermark strictly passes — the equal-ts ref
    // processes BEFORE the probe (inclusive as-of), so the probe
    // matches it; the carry persists with nothing pending
    val st2 = new FakeState[StreamingAsOf.AsOfState](st1.opt,
      T0 / 1000L + 1000L)
    val out2 = step(5L, Iterator.empty, st2).toSeq
    assert(out2.map(e => (e.event_id, e.ref_event_id)) ==
      Seq((2L, Some(1L))))
    assert(st2.opt.exists(s => s.pending.isEmpty && s.hasRef &&
      s.lastRefId == 1L), "the O(1) ref carry outlives finalization")
    assert(st2.timeoutMs.isEmpty,
      "no timeout armed with nothing pending — the tail is permanent")
    // invocation 3: a much-later probe still enriches from the carry
    val st3 = new FakeState[StreamingAsOf.AsOfState](st2.opt,
      T0 / 1000L + 10000L)
    val out3 = step(5L, Iterator(ev(3L, T0 + 15000000L, "purchase")),
      st3).toSeq
    assert(out3.isEmpty, "still pending until the watermark passes it")
    val st4 = new FakeState[StreamingAsOf.AsOfState](st3.opt,
      T0 / 1000L + 20000L)
    val out4 = step(5L, Iterator.empty, st4).toSeq
    assert(out4.map(e => (e.event_id, e.ref_event_id)) ==
      Seq((3L, Some(1L))))
  }

  test("transStep: boundary row is deferred, then chains in (ts, id) order") {
    val st1 = new FakeState[TransState](None, T0 / 1000L)
    val out1 = StreamingFeatures.transStep(5L,
      Iterator(TransEvent(5L, 1L, mkTs(T0), "a")), st1).toSeq
    assert(out1.isEmpty, "ts == wm must not finalize (strict below)")
    assert(st1.opt.exists(_.pending.exists(_.id == 1L)))
    // a same-ts row arriving at the frontier is admitted; when the
    // watermark strictly passes, both finalize and pair in id order
    val st2 = new FakeState[TransState](st1.opt, T0 / 1000L)
    val out2 = StreamingFeatures.transStep(5L,
      Iterator(TransEvent(5L, 2L, mkTs(T0), "b")), st2).toSeq
    assert(out2.isEmpty)
    val st3 = new FakeState[TransState](st2.opt, T0 / 1000L + 1000L)
    val out3 = StreamingFeatures.transStep(5L, Iterator.empty, st3).toSeq
    assert(out3 == Seq(TransEmit(5L, "a", "b")))
    assert(st3.opt.exists(s => s.pending.isEmpty &&
      s.last.exists(_.id == 2L)), "chain tail is the last finalized row")
  }
}
