package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Dataset

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.sql.Timestamp

/** Streaming faces of the batch feature operators
  * [[graft.ext.TimeSeries.rollingRange]] and
  * [[graft.ext.EventWindows.transitions]] — the live-feature-store
  * path: a user feeding trailing-window engagement features or a
  * next-event transition model from a stream hits these first once
  * the batch variants exist.
  *
  * Both use `flatMapGroupsWithState` with **finalize-on-watermark**
  * semantics: an event's output row is emitted only once the event-
  * time watermark has passed STRICTLY above its timestamp, so every
  * event that can still arrive and land inside the trailing window
  * (or between two finalized events) has conclusively arrived. The
  * strict inequality is deliberate: the exact boundary convention of
  * Spark's stateful admission gate is an implementation detail (the
  * 4.1.2 `WatermarkSupport.watermarkExpression` drops `ts <= wm`,
  * while the documented guarantee only promises rows strictly below
  * the watermark are "too late" — verified against the shipped
  * bytecode), so finalizing strictly below and admitting `ts >=
  * frontier` keeps the operators correct under EITHER convention: a
  * row the gate admits is never silently lost here, and a boundary
  * row is merely deferred one watermark advance, which the
  * sentinel-push replay protocol always provides. Within the watermark
  * the streamed output is therefore ROW-EQUAL to the batch operator
  * run over the same finalized prefix — pinned in
  * StreamingFeaturesSpec and by the `stream_*_replay` driver queries
  * against the batch oracles. Events older than the watermark at
  * arrival are dropped BEFORE they reach the operator (Spark's
  * stateful admission gate filters late rows), so the caller's
  * `watermarkDelay` must bound the maximum arrival disorder — they
  * are exactly the rows a batch replay would place inside
  * already-finalized windows.
  *
  * State per key is bounded by the watermark horizon:
  *   - rolling: the not-yet-finalized events plus the trailing-window
  *     lookback behind the watermark — O(events in
  *     `watermark delay + trailing`), evicted as the watermark moves;
  *     an event-time timeout re-fires the key so finalization happens
  *     even when no new events arrive for it.
  *   - transitions: the not-yet-finalized events plus ONE finalized
  *     event (the chain tail) — O(events in the delay) + O(1).
  *
  * At 1000-executor scale both are a single hash-partitioning of the
  * stream by key (the same one shuffle as the batch variants), state
  * store-backed, with no per-batch driver work.
  */
object StreamingFeatures {

  // ---- rolling ----------------------------------------------------

  /** Input row for [[rollingRange]] — mirrors the events-table
    * projection the batch query uses. */
  final case class RollEvent(user_id: Long, event_id: Long,
      ts: Timestamp, value: Double)

  /** Finalized output row: identical columns to the batch
    * `events_rolling` projection. */
  final case class RollEmit(event_id: Long, user_id: Long,
      roll_cnt: Long, roll_sum: Double)

  private[streaming] final case class BufEv(id: Long, tsUs: Long,
      v: Double)

  /** `frontierUs` = the watermark this key has emitted strictly below
    * (rows at `frontier` are still admissible and pending); `buf`
    * holds events above `frontier − trailing` (pending rows plus the
    * lookback they still need). */
  private[streaming] final case class RollState(frontierUs: Long,
      buf: Seq[BufEv])

  private def tsUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Batch-parity rounding: Spark's double→DECIMAL(25,6) cast is
    * HALF_UP; summed exactly as decimals, one final double conversion
    * — the events_tumbling posture. */
  private def round6(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)

  /** Key-agnostic emission of the rolling state machine; each face
    * re-attaches its key shape. */
  final case class RollCoreEmit(event_id: Long, roll_cnt: Long,
      roll_sum: Double)

  private[streaming] def rollCoreStep(trailingMicros: Long,
      incomingIt: Iterator[BufEv], st: GroupState[RollState])
      : Iterator[RollCoreEmit] = {
    val prev = st.getOption.getOrElse(RollState(Long.MinValue, Nil))
    val wmUs = st.getCurrentWatermarkMs() * 1000L
    // rows strictly below the emitted frontier are conclusively late
    // (batch replay would have placed them inside already-finalized
    // windows) — dropped per the watermark contract; a row AT the
    // frontier was never finalized (strict-below emission), so it is
    // kept regardless of which boundary convention the gate uses
    val incoming = incomingIt.filter(_.tsUs >= prev.frontierUs).toSeq
    val buf = prev.buf ++ incoming
    // one sort + exact-decimal prefix sums, frames found by binary
    // search — O(n log n) per invocation even when a whole key
    // finalizes at once (decimal subtraction is exact, so a prefix
    // difference equals the direct frame sum bit-for-bit)
    val sorted = buf.sortBy(e => (e.tsUs, e.id)).toIndexedSeq
    val prefix = sorted.scanLeft(JBigDecimal.ZERO)((acc, e) =>
      acc.add(round6(e.v)))
    def bound(t: Long, inclusive: Boolean): Int = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (sorted(m).tsUs < t || (inclusive && sorted(m).tsUs == t))
          lo = m + 1
        else hi = m
      }
      lo
    }
    val out = sorted
      .filter(e => e.tsUs >= prev.frontierUs && e.tsUs < wmUs)
      .map { e =>
        val lo = bound(e.tsUs - trailingMicros, inclusive = false)
        val hi = bound(e.tsUs, inclusive = true)
        RollCoreEmit(e.id, (hi - lo).toLong,
          prefix(hi).subtract(prefix(lo)).doubleValue)
      }
    val frontier = math.max(prev.frontierUs, wmUs)
    val kept = buf.filter(_.tsUs >= frontier - trailingMicros)
    if (kept.isEmpty) st.remove()
    else {
      st.update(RollState(frontier, kept))
      val pending = kept.filter(_.tsUs >= frontier)
      // re-fire when the watermark can finalize the earliest pending
      // row; with none pending, fire once the lookback has aged out
      // so dead keys do not pin state forever
      val fireUs =
        if (pending.nonEmpty) pending.map(_.tsUs).min
        else kept.map(_.tsUs).max + trailingMicros
      st.setTimeoutTimestamp(math.max(fireUs / 1000L,
        st.getCurrentWatermarkMs() + 1L))
    }
    out.iterator
  }

  private[streaming] def rollStep(trailingMicros: Long)(userId: Long,
      it: Iterator[RollEvent], st: GroupState[RollState])
      : Iterator[RollEmit] =
    rollCoreStep(trailingMicros,
      it.map(e => BufEv(e.event_id, tsUs(e.ts), e.value)), st)
      .map(c => RollEmit(c.event_id, userId, c.roll_cnt, c.roll_sum))

  /** Streaming trailing time-range rolling count + sum per key over
    * `[ts − trailingMicros, ts]`, finalized at the watermark. The
    * caller's `watermarkDelay` is the disorder bound ("0 seconds" for
    * an ordered replay). */
  def rollingRange(events: Dataset[RollEvent], trailingMicros: Long,
      watermarkDelay: String): Dataset[RollEmit] = {
    require(trailingMicros > 0, "trailingMicros must be positive")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(rollStep(trailingMicros))
  }

  /** Column names [[rollingRangeRows]] appends to the key columns. */
  private val RollEmitCols = Seq("event_id", "roll_cnt", "roll_sum")

  /** Composite-key face of [[rollingRange]] — the same generalization
    * [[StreamingAsOf.asOfEnrichRows]] gives the as-of operator: a
    * (user, region)-keyed feature stream computes its trailing window
    * per COMPOSITE key (hash-partitioned on all key columns via one
    * key struct through `flatMapGroupsWithState`), so events never
    * leak across tenants/shards sharing one entity id. Same state
    * machine, same single shuffle; key arity never touches per-key
    * state size. `events` must carry a TIMESTAMP `tsCol`, a LONG
    * `idCol` (unique per event), a numeric `valueCol` (cast to
    * double), and the key columns; output = key columns +
    * (event_id, roll_cnt, roll_sum). */
  def rollingRangeRows(events: org.apache.spark.sql.DataFrame,
      keys: Seq[String], trailingMicros: Long, watermarkDelay: String,
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.functions.col
    require(trailingMicros > 0, "trailingMicros must be positive")
    require(keys.nonEmpty, "rollingRangeRows needs at least one key column")
    val clash = keys.filter(RollEmitCols.contains)
    require(clash.isEmpty, s"key columns ${clash.mkString(", ")} collide " +
      s"with the emitted columns (${RollEmitCols.mkString(", ")})")
    // the value must be numeric at CALL time (a string column would
    // cast to all-nulls silently); the cast below then gives the step
    // one runtime type
    RowFaces.numericField(events.schema, valueCol)
    val norm = events.withColumn(valueCol, col(valueCol).cast("double"))
    val schema = norm.schema
    val tsIdx = RowFaces.timestampField(schema, tsCol)
    val idIdx = RowFaces.fieldOfType(schema, idCol,
      org.apache.spark.sql.types.LongType)
    val vIdx = schema.fieldIndex(valueCol)
    val keyIdx = keys.map(schema.fieldIndex)
    implicit val keyEnc: Encoder[Row] = Encoders.row(
      org.apache.spark.sql.types.StructType(keyIdx.map(schema(_))))
    implicit val outEnc: Encoder[(Row, RollCoreEmit)] =
      Encoders.tuple(keyEnc, Encoders.product[RollCoreEmit])
    implicit val stateEnc: Encoder[RollState] = Encoders.product[RollState]
    norm.withWatermark(tsCol, watermarkDelay)
      .groupByKey((r: Row) => Row.fromSeq(keyIdx.map(r.get)): Row)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (k: Row, it: Iterator[Row], st: GroupState[RollState]) =>
          rollCoreStep(trailingMicros,
            it.map(r => BufEv(r.getLong(idIdx),
              RowFaces.tsMicros(r, tsIdx, tsCol),
              RowFaces.doubleCell(r, vIdx, valueCol))), st)
            .map(c => (k, c))
      }
      .select(keys.map(k => col(s"_1.`$k`").as(k)) ++
        RollEmitCols.map(c => col(s"_2.`$c`").as(c)): _*)
  }

  // ---- gap-fill LOCF ----------------------------------------------

  /** One gap-filled slot row — identical columns to the batch
    * [[graft.ext.TimeSeries.gapFillLocf]] output. */
  final case class GapEmit(user_id: Long, slot_ts: Timestamp,
      value: Double, is_observed: Boolean)

  private[streaming] final case class ObsEv(slot: Long, tsUs: Long,
      v: Double)

  /** `emittedUpTo` = last emitted slot (MinValue before the first);
    * `lastVal` carries the LOCF value across the emission frontier;
    * `obs` holds observations in not-yet-emitted slots. */
  private[streaming] final case class GapState(emittedUpTo: Long,
      lastVal: Double, hasLast: Boolean, obs: Seq[ObsEv])

  /** Key-agnostic emission of the gap-fill state machine. */
  final case class GapCoreEmit(slot_ts: Timestamp, value: Double,
      is_observed: Boolean)

  private[streaming] def gapCoreStep(stepMicros: Long,
      incomingIt: Iterator[ObsEv], st: GroupState[GapState])
      : Iterator[GapCoreEmit] = {
    val prev = st.getOption.getOrElse(
      GapState(Long.MinValue, 0.0, hasLast = false, Nil))
    val wmUs = st.getCurrentWatermarkMs() * 1000L
    val incoming = incomingIt.toSeq
    val obs = prev.obs ++ incoming
    // a slot is conclusively closed once the watermark reaches its
    // END: every admissible future event has ts >= wm >= slotEnd, so
    // neither the slot's representative, nor the spine's lower end,
    // nor any LOCF value at or below it can change. Largest aligned s
    // with s + step <= wm is slotOf(wm) - step in both the boundary
    // and interior cases.
    val closedMax = (wmUs - math.floorMod(wmUs, stepMicros)) - stepMicros
    // spine membership: batch emits [firstObsSlot, maxObsSlot]; any
    // KNOWN observation (finalized or pending) already guarantees the
    // spine reaches its slot, and future events can only extend it
    val spineMax = if (obs.isEmpty) Long.MinValue else obs.map(_.slot).max
    val from =
      if (prev.emittedUpTo != Long.MinValue) prev.emittedUpTo + stepMicros
      else if (obs.isEmpty) Long.MaxValue
      else obs.map(_.slot).min
    val to = math.min(closedMax, spineMax)
    val bySlot = obs.groupBy(_.slot)
    var lastVal = prev.lastVal; var hasLast = prev.hasLast
    val out = scala.collection.mutable.ArrayBuffer.empty[GapCoreEmit]
    def slotTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    var s = from
    while (s <= to) {
      bySlot.get(s) match {
        case Some(es) =>
          val rep = es.maxBy(e => (e.tsUs, e.v))
          lastVal = rep.v; hasLast = true
          out += GapCoreEmit(slotTs(s), lastVal, is_observed = true)
        case None =>
          // from starts at the first OBSERVED slot, so a gap slot
          // always has a carried value
          out += GapCoreEmit(slotTs(s), lastVal, is_observed = false)
      }
      s += stepMicros
    }
    val emittedUpTo = if (to >= from) to else prev.emittedUpTo
    val kept = obs.filter(_.slot > emittedUpTo)
    if (kept.isEmpty && !hasLast) st.remove()
    else {
      st.update(GapState(emittedUpTo, lastVal, hasLast, kept))
      if (kept.nonEmpty) {
        // fire once the next unemitted slot CLOSES (its end passes
        // the watermark) so long observation gaps still drain
        val nextSlot =
          if (emittedUpTo != Long.MinValue) emittedUpTo + stepMicros
          else kept.map(_.slot).min
        st.setTimeoutTimestamp(math.max((nextSlot + stepMicros) / 1000L,
          st.getCurrentWatermarkMs() + 1L))
      }
    }
    out.iterator
  }

  private def gapStep(stepMicros: Long)(userId: Long,
      it: Iterator[RollEvent], st: GroupState[GapState])
      : Iterator[GapEmit] =
    gapCoreStep(stepMicros, it.map { e =>
      val us = tsUs(e.ts)
      ObsEv(us - math.floorMod(us, stepMicros), us, e.value)
    }, st).map(c => GapEmit(userId, c.slot_ts, c.value, c.is_observed))

  /** Streaming fixed-step gap-fill with LOCF, finalized at the
    * watermark: per key, emits the dense slot spine from the first
    * observation onward as slots close, carrying the latest observed
    * value across empty slots — the streamed prefix of the batch
    * [[graft.ext.TimeSeries.gapFillLocf]] output (row-equal once the
    * watermark passes the last observation). */
  def gapFillLocf(events: Dataset[RollEvent], stepMicros: Long,
      watermarkDelay: String): Dataset[GapEmit] = {
    require(stepMicros > 0, "stepMicros must be positive")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(gapStep(stepMicros))
  }

  /** Column names [[gapFillLocfRows]] appends to the key columns. */
  private val GapEmitCols = Seq("slot_ts", "value", "is_observed")

  /** Composite-key face of [[gapFillLocf]] (the [[rollingRangeRows]]
    * pattern): the dense LOCF slot spine per COMPOSITE key — a
    * (sensor, channel)- or (user, region)-keyed series gap-fills per
    * channel, never carrying one channel's value into another's gap.
    * Output = key columns + (slot_ts, value, is_observed). */
  def gapFillLocfRows(events: org.apache.spark.sql.DataFrame,
      keys: Seq[String], stepMicros: Long, watermarkDelay: String,
      tsCol: String = "ts", valueCol: String = "value")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.functions.col
    require(stepMicros > 0, "stepMicros must be positive")
    require(keys.nonEmpty, "gapFillLocfRows needs at least one key column")
    val clash = keys.filter(GapEmitCols.contains)
    require(clash.isEmpty, s"key columns ${clash.mkString(", ")} collide " +
      s"with the emitted columns (${GapEmitCols.mkString(", ")})")
    RowFaces.numericField(events.schema, valueCol)
    val norm = events.withColumn(valueCol, col(valueCol).cast("double"))
    val schema = norm.schema
    val tsIdx = RowFaces.timestampField(schema, tsCol)
    val vIdx = schema.fieldIndex(valueCol)
    val keyIdx = keys.map(schema.fieldIndex)
    implicit val keyEnc: Encoder[Row] = Encoders.row(
      org.apache.spark.sql.types.StructType(keyIdx.map(schema(_))))
    implicit val outEnc: Encoder[(Row, GapCoreEmit)] =
      Encoders.tuple(keyEnc, Encoders.product[GapCoreEmit])
    implicit val stateEnc: Encoder[GapState] = Encoders.product[GapState]
    norm.withWatermark(tsCol, watermarkDelay)
      .groupByKey((r: Row) => Row.fromSeq(keyIdx.map(r.get)): Row)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (k: Row, it: Iterator[Row], st: GroupState[GapState]) =>
          gapCoreStep(stepMicros, it.map { r =>
            val us = RowFaces.tsMicros(r, tsIdx, tsCol)
            ObsEv(us - math.floorMod(us, stepMicros), us,
              RowFaces.doubleCell(r, vIdx, valueCol))
          }, st).map(c => (k, c))
      }
      .select(keys.map(k => col(s"_1.`$k`").as(k)) ++
        GapEmitCols.map(c => col(s"_2.`$c`").as(c)): _*)
  }

  // ---- transitions ------------------------------------------------

  /** Input row for [[transitions]] — (ts, event_id) is the total
    * order within a key, exactly the batch operator's orderCols. */
  final case class TransEvent(user_id: Long, event_id: Long,
      ts: Timestamp, event_type: String)

  /** One finalized adjacent-pair observation; counts/probabilities
    * are a downstream aggregation of this stream. */
  final case class TransEmit(user_id: Long, from_state: String,
      to_state: String)

  private[streaming] final case class PendEv(tsUs: Long, id: Long,
      state: String)

  /** `last` is the chain tail — the single already-finalized event the
    * next finalized event pairs with. */
  private[streaming] final case class TransState(frontierUs: Long,
      pending: Seq[PendEv], last: Option[PendEv])

  /** Key-agnostic emission of the transition state machine. */
  final case class TransCoreEmit(from_state: String, to_state: String)

  private[streaming] def transCoreStep(incomingIt: Iterator[PendEv],
      st: GroupState[TransState]): Iterator[TransCoreEmit] = {
    val prev = st.getOption.getOrElse(TransState(Long.MinValue, Nil, None))
    val wmUs = st.getCurrentWatermarkMs() * 1000L
    val incoming = incomingIt.filter(_.tsUs >= prev.frontierUs).toSeq
    val all = prev.pending ++ incoming
    // strictly below the watermark: a row AT the watermark may still
    // arrive (Spark's gate drops only strictly-below), so it is not
    // yet final — see the object scaladoc
    val (readyU, pending) = all.partition(_.tsUs < wmUs)
    val ready = readyU.sortBy(e => (e.tsUs, e.id))
    val chain = prev.last.toSeq ++ ready
    val out = chain.iterator.sliding(2).withPartial(false)
      .map { case Seq(a, b) => TransCoreEmit(a.state, b.state) }
      .toSeq
    val frontier = math.max(prev.frontierUs, wmUs)
    val last = ready.lastOption.orElse(prev.last)
    st.update(TransState(frontier, pending, last))
    if (pending.nonEmpty)
      st.setTimeoutTimestamp(math.max(pending.map(_.tsUs).min / 1000L,
        st.getCurrentWatermarkMs() + 1L))
    // with nothing pending no timeout is armed: the remaining state is
    // the O(1) chain tail, which must outlive any silence gap anyway
    out.iterator
  }

  private[streaming] def transStep(userId: Long, it: Iterator[TransEvent],
      st: GroupState[TransState]): Iterator[TransEmit] =
    transCoreStep(
      it.map(e => PendEv(tsUs(e.ts), e.event_id, e.event_type)), st)
      .map(c => TransEmit(userId, c.from_state, c.to_state))

  /** Streaming Markov-transition pair extraction per key, finalized at
    * the watermark: emits one `(key, from_state, to_state)` row per
    * adjacent pair in the (ts, event_id) order, exactly the pairs the
    * batch `lead` produces. */
  def transitions(events: Dataset[TransEvent], watermarkDelay: String)
      : Dataset[TransEmit] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(transStep)
  }

  /** Shared scaffolding for the composite-key faces of the
    * (ts, id, type)-shaped state machines (transitions, funnel,
    * retention): one key struct through `flatMapGroupsWithState`,
    * re-expanded on emit — the [[graft.streaming.RowFaces]] reads
    * keep the face correct under either session datetime
    * representation. */
  private def eventRowsFace[S, E](events: org.apache.spark.sql.DataFrame,
      keys: Seq[String], watermarkDelay: String, tsCol: String,
      idCol: String, typeCol: String, emitCols: Seq[String],
      step: (Iterator[PendEv], GroupState[S]) => Iterator[E])(
      implicit stateEnc: org.apache.spark.sql.Encoder[S],
      emitEnc: org.apache.spark.sql.Encoder[E])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.functions.col
    require(keys.nonEmpty, "a Rows face needs at least one key column")
    val clash = keys.filter(emitCols.contains)
    require(clash.isEmpty, s"key columns ${clash.mkString(", ")} collide " +
      s"with the emitted columns (${emitCols.mkString(", ")})")
    val schema = events.schema
    val tsIdx = RowFaces.timestampField(schema, tsCol)
    val idIdx = RowFaces.fieldOfType(schema, idCol,
      org.apache.spark.sql.types.LongType)
    val typeIdx = RowFaces.fieldOfType(schema, typeCol,
      org.apache.spark.sql.types.StringType)
    val keyIdx = keys.map(schema.fieldIndex)
    implicit val keyEnc: Encoder[Row] = Encoders.row(
      org.apache.spark.sql.types.StructType(keyIdx.map(schema(_))))
    implicit val outEnc: Encoder[(Row, E)] =
      Encoders.tuple(keyEnc, emitEnc)
    events.withWatermark(tsCol, watermarkDelay)
      .groupByKey((r: Row) => Row.fromSeq(keyIdx.map(r.get)): Row)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (k: Row, it: Iterator[Row], st: GroupState[S]) =>
          step(it.map(r => PendEv(RowFaces.tsMicros(r, tsIdx, tsCol),
            r.getLong(idIdx), r.getString(typeIdx))), st)
            .map(c => (k, c))
      }
      .select(keys.map(k => col(s"_1.`$k`").as(k)) ++
        emitCols.map(c => col(s"_2.`$c`").as(c)): _*)
  }

  /** Composite-key face of [[transitions]]: adjacent-pair extraction
    * per COMPOSITE key — per-(user, region) Markov chains, so one
    * entity's sessions in different tenants never chain together.
    * Output = key columns + (from_state, to_state), one row per
    * finalized adjacent pair in (ts, id) order within the key. */
  def transitionsRows(events: org.apache.spark.sql.DataFrame,
      keys: Seq[String], watermarkDelay: String,
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    eventRowsFace[TransState, TransCoreEmit](events, keys,
      watermarkDelay, tsCol, idCol, typeCol,
      Seq("from_state", "to_state"), transCoreStep)(
      Encoders.product[TransState], Encoders.product[TransCoreEmit])
  }

  /** Composite-key face of [[funnel]]: greedy-earliest stage advances
    * per COMPOSITE key — the same user funnels independently per
    * tenant/region. Output = key columns + (stage, stage_ts), one
    * emit-once row per advance. */
  def funnelRows(events: org.apache.spark.sql.DataFrame,
      keys: Seq[String], steps: Seq[String], watermarkDelay: String,
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    require(steps.nonEmpty, "funnel needs at least one step")
    eventRowsFace[FunnelState, FunnelCoreEmit](events, keys,
      watermarkDelay, tsCol, idCol, typeCol,
      Seq("stage", "stage_ts"),
      (it, st) => funnelCoreStep(steps, it, st))(
      Encoders.product[FunnelState], Encoders.product[FunnelCoreEmit])
  }

  /** Composite-key face of [[cohortRetention]]: the (key, active week)
    * emit-once observations per COMPOSITE key — per-tenant retention
    * triangles whose cohorts are the key's own first event. Output =
    * key columns + (cohort_week, week_offset). */
  def cohortRetentionRows(events: org.apache.spark.sql.DataFrame,
      keys: Seq[String], watermarkDelay: String,
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    eventRowsFace[RetentionState, RetentionCoreEmit](events, keys,
      watermarkDelay, tsCol, idCol, typeCol,
      Seq("cohort_week", "week_offset"), retentionCoreStep)(
      Encoders.product[RetentionState],
      Encoders.product[RetentionCoreEmit])
  }

  // ---- funnel -----------------------------------------------------

  /** One funnel advance: the key reached `stage` (1-based) at
    * `stage_ts`. Advances are MONOTONE per key — each (key, stage)
    * emits at most once, ever — which is what makes the funnel
    * append-mode clean; per-stage user counts are a downstream
    * aggregation of this stream. */
  final case class FunnelAdvance(user_id: Long, stage: Int,
      stage_ts: Timestamp)

  /** `stage`/`stageTs` = the greedy-earliest chain position reached
    * over all finalized events. */
  private[streaming] final case class FunnelState(frontierUs: Long,
      pending: Seq[PendEv], stage: Int, stageTs: Long)

  /** Key-agnostic emission of the funnel state machine. */
  final case class FunnelCoreEmit(stage: Int, stage_ts: Timestamp)

  private[streaming] def funnelCoreStep(steps: Seq[String],
      incomingIt: Iterator[PendEv], st: GroupState[FunnelState])
      : Iterator[FunnelCoreEmit] = {
    val prev = st.getOption.getOrElse(
      FunnelState(Long.MinValue, Nil, 0, Long.MinValue))
    val wmUs = st.getCurrentWatermarkMs() * 1000L
    val incoming = incomingIt.filter(_.tsUs >= prev.frontierUs).toSeq
    val all = prev.pending ++ incoming
    val (readyU, pending) = all.partition(_.tsUs < wmUs)
    // one ascending pass IS the greedy-earliest chain: the first
    // next-step event strictly after the current stage time advances
    // (batch semantics: t_{i+1} = min step ts > t_i, strict)
    var stage = prev.stage; var stageTs = prev.stageTs
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelCoreEmit]
    readyU.sortBy(e => (e.tsUs, e.id)).foreach { e =>
      if (stage < steps.length && e.state == steps(stage) &&
          (stage == 0 || e.tsUs > stageTs)) {
        stage += 1; stageTs = e.tsUs
        val t = new Timestamp(e.tsUs / 1000L)
        t.setNanos((math.floorMod(e.tsUs, 1000000L) * 1000L).toInt)
        out += FunnelCoreEmit(stage, t)
      }
    }
    val frontier = math.max(prev.frontierUs, wmUs)
    st.update(FunnelState(frontier, pending, stage, stageTs))
    if (pending.nonEmpty)
      st.setTimeoutTimestamp(math.max(pending.map(_.tsUs).min / 1000L,
        st.getCurrentWatermarkMs() + 1L))
    out.iterator
  }

  private def funnelStep(steps: Seq[String])(userId: Long,
      it: Iterator[TransEvent], st: GroupState[FunnelState])
      : Iterator[FunnelAdvance] =
    funnelCoreStep(steps,
      it.map(e => PendEv(tsUs(e.ts), e.event_id, e.event_type)), st)
      .map(c => FunnelAdvance(userId, c.stage, c.stage_ts))

  /** One retention observation: the key (user) whose FIRST event fell
    * in `cohort_week` was active in `cohort_week + week_offset`.
    * (user, week) pairs are emit-once monotone, so the stream is
    * append-clean; the retention triangle `(cohort_week, week_offset,
    * n_active)` is a downstream count of this stream (pairs are
    * unique, so count(*) IS countDistinct(user)). */
  final case class RetentionEmit(user_id: Long, cohort_week: Long,
      week_offset: Long)

  /** `cohortWeek` = epoch-week of the first finalized event
    * (MinValue before it); `weeksSeen` = active weeks already
    * emitted — bounded by the observation span in weeks. */
  private[streaming] final case class RetentionState(frontierUs: Long,
      pending: Seq[PendEv], cohortWeek: Long, weeksSeen: Seq[Long])

  /** Key-agnostic emission of the retention state machine. */
  final case class RetentionCoreEmit(cohort_week: Long, week_offset: Long)

  private[streaming] def retentionCoreStep(incomingIt: Iterator[PendEv],
      st: GroupState[RetentionState]): Iterator[RetentionCoreEmit] = {
    val prev = st.getOption.getOrElse(
      RetentionState(Long.MinValue, Nil, Long.MinValue, Nil))
    val wmUs = st.getCurrentWatermarkMs() * 1000L
    val incoming = incomingIt.filter(_.tsUs >= prev.frontierUs).toSeq
    val all = prev.pending ++ incoming
    val (readyU, pending) = all.partition(_.tsUs < wmUs)
    // ascending finalization order makes the first finalized event the
    // user's true first event (anything earlier would be beyond the
    // watermark contract) — integer epoch-week arithmetic, timezone-free
    var cohort = prev.cohortWeek
    var seen = prev.weeksSeen
    val out = scala.collection.mutable.ArrayBuffer.empty[RetentionCoreEmit]
    readyU.sortBy(e => (e.tsUs, e.id)).foreach { e =>
      val week = Math.floorDiv(Math.floorDiv(e.tsUs, 1000000L), 604800L)
      if (cohort == Long.MinValue) cohort = week
      if (!seen.contains(week)) {
        seen = seen :+ week
        out += RetentionCoreEmit(cohort, week - cohort)
      }
    }
    val frontier = math.max(prev.frontierUs, wmUs)
    st.update(RetentionState(frontier, pending, cohort, seen))
    if (pending.nonEmpty)
      st.setTimeoutTimestamp(math.max(pending.map(_.tsUs).min / 1000L,
        st.getCurrentWatermarkMs() + 1L))
    out.iterator
  }

  private def retentionStep(userId: Long, it: Iterator[TransEvent],
      st: GroupState[RetentionState]): Iterator[RetentionEmit] =
    retentionCoreStep(
      it.map(e => PendEv(tsUs(e.ts), e.event_id, e.event_type)), st)
      .map(c => RetentionEmit(userId, c.cohort_week, c.week_offset))

  /** Streaming weekly cohort retention, finalized at the watermark:
    * per key, emits one row per newly observed active week, tagged
    * with the key's cohort (the epoch-week of its first event) — the
    * streamed prefix of the batch
    * [[graft.ext.EventWindows.cohortRetention]] triangle. */
  def cohortRetention(events: Dataset[TransEvent],
      watermarkDelay: String): Dataset[RetentionEmit] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(retentionStep)
  }

  /** Streaming conversion funnel, finalized at the watermark: per key,
    * emits one row per GREEDY-EARLIEST chain advance through `steps`
    * (stage i+1 = the first step-(i+1) event strictly after the stage-i
    * time — the batch [[graft.ext.EventWindows.funnel]] chain). Per-key
    * state after quiescence is O(1): the chain position plus the
    * pending-within-delay events. */
  def funnel(events: Dataset[TransEvent], steps: Seq[String],
      watermarkDelay: String): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "steps must be nonempty")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(funnelStep(steps))
  }
}
