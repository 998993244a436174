package graft.streaming

import graft.streaming.StreamingFeatures.TransEvent
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}

import java.sql.Timestamp

/** Streaming as-of (point-in-time) enrichment — the CONSUMPTION face
  * of [[graft.ops.AsOfJoin]]: enrich a live probe stream (purchases,
  * inference requests) against a reference stream (views, feature
  * updates, a keyed table's CDC change-feed) with the same
  * greatest-ref-ts ≤ probe-ts semantics, finalized at the watermark.
  * A user who adopted [[StreamingFeatures]] for feature *generation*
  * hits this on the very next job: the features have to be joined
  * back onto live events point-in-time (reference anchor: the
  * reference's gold enrichment run,
  * `AirflowHudiLabs/Lab2/jobs/python/incremental_etl_orders.py:467-482`,
  * is exactly this join as a batch-incremental job).
  *
  * Shape: ONE type-tagged union stream (the batch operator's
  * union+window plan, re-expressed as state): both sides arrive as
  * [[TransEvent]] rows distinguished by `event_type`, are hash-
  * partitioned by key ONCE (the same single shuffle as the batch
  * plan), and a `flatMapGroupsWithState` per key carries the latest
  * finalized reference row — the streaming twin of the batch
  * `last(_, ignoreNulls)` window carry. Finalization follows the
  * [[StreamingFeatures]] contract exactly: an event is processed only
  * once the watermark is STRICTLY above its timestamp, in ascending
  * `(ts, side, id)` order with reference rows before probe rows at
  * the same timestamp — so a ref at exactly the probe's timestamp
  * matches (inclusive as-of, the batch `_side` discipline).
  *
  * Semantics pinned against the batch operator (StreamingAsOfSpec +
  * the `stream_asof_replay` driver queries, which are oracled against
  * the SAME DuckDB ASOF SQL as the batch queries, literally):
  *   - probe rows are LEFT-OUTER: every finalized probe emits, with a
  *     null match when no reference precedes it;
  *   - `toleranceMicros` is match-then-null (the batch TTL contract):
  *     the greatest ref ≤ probe-ts is found first, and discarded if
  *     older than `probe-ts − tolerance` — never "search further
  *     back";
  *   - ties among reference rows at one timestamp resolve to the
  *     greatest `event_id` (the batch window's order among equal
  *     `(_t, _side)` keys is engine-arbitrary; the streaming face
  *     pins it).
  *
  * The emitted match is the reference row's IDENTITY `(ref_event_id,
  * ref_ts)`, not a wide payload: per-key state stays O(pending within
  * the watermark delay) + O(1) regardless of feature width, and wide
  * payloads join back on `ref_event_id` downstream (one broadcast or
  * shuffle join against the reference table — the same plan a batch
  * enrichment would run). At 1000 executors this is one hash
  * partitioning of the union stream, state-store-backed, no per-batch
  * driver work; the carried ref row must outlive silence gaps, so a
  * key with nothing pending keeps its O(1) tail with no timeout armed
  * (the [[StreamingFeatures.transitions]] chain-tail posture).
  */
object StreamingAsOf {

  /** One enriched probe row: the probe event plus the identity of its
    * point-in-time reference match (null columns = no admissible
    * match — left-outer, or tolerance-discarded). */
  final case class AsOfEmit(event_id: Long, user_id: Long,
      ts: Timestamp, ref_event_id: Option[Long],
      ref_ts: Option[Timestamp])

  /** Key-agnostic emission — what the state machine itself produces;
    * each face re-attaches its key shape (the single `user_id` for
    * [[asOfEnrich]], the caller's composite key columns for
    * [[asOfEnrichRows]]). */
  final case class AsOfCoreEmit(event_id: Long, ts: Timestamp,
      ref_event_id: Option[Long], ref_ts: Option[Timestamp])

  private[streaming] final case class AsOfEv(tsUs: Long, id: Long,
      isRef: Boolean)

  /** `lastRefTsUs/lastRefId` carry the latest finalized reference row
    * (valid iff `hasRef`) — the O(1) streaming twin of the batch
    * window carry; `pending` holds not-yet-finalized rows of BOTH
    * sides. */
  private[streaming] final case class AsOfState(frontierUs: Long,
      pending: Seq[AsOfEv], hasRef: Boolean, lastRefTsUs: Long,
      lastRefId: Long)

  private def tsUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def mkTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** The key-agnostic state machine both faces share: fold the
    * incoming (already side-resolved) events into the carry state and
    * emit one [[AsOfCoreEmit]] per finalized probe. */
  private[streaming] def coreStep(toleranceMicros: Option[Long],
      incomingIt: Iterator[AsOfEv],
      st: GroupState[AsOfState]): Iterator[AsOfCoreEmit] = {
    val prev = st.getOption.getOrElse(
      AsOfState(Long.MinValue, Nil, hasRef = false, 0L, 0L))
    val wmUs = st.getCurrentWatermarkMs() * 1000L
    val incoming = incomingIt.filter(_.tsUs >= prev.frontierUs).toSeq
    val all = prev.pending ++ incoming
    val (readyU, pending) = all.partition(_.tsUs < wmUs)
    // refs before probes at the same timestamp (inclusive as-of), ref
    // ties by ascending id so the LAST processed — the greatest id —
    // wins the carry
    val ready = readyU.sortBy(e => (e.tsUs, if (e.isRef) 0 else 1, e.id))
    var hasRef = prev.hasRef
    var refTs = prev.lastRefTsUs; var refId = prev.lastRefId
    val out = scala.collection.mutable.ArrayBuffer.empty[AsOfCoreEmit]
    ready.foreach { e =>
      if (e.isRef) { hasRef = true; refTs = e.tsUs; refId = e.id }
      else {
        // match-then-null: the carried ref IS the greatest rt <= lt;
        // tolerance only decides whether it survives
        val fresh = hasRef &&
          toleranceMicros.forall(t => e.tsUs - refTs <= t)
        out += AsOfCoreEmit(e.id, mkTs(e.tsUs),
          if (fresh) Some(refId) else None,
          if (fresh) Some(mkTs(refTs)) else None)
      }
    }
    val frontier = math.max(prev.frontierUs, wmUs)
    st.update(AsOfState(frontier, pending, hasRef, refTs, refId))
    if (pending.nonEmpty)
      st.setTimeoutTimestamp(math.max(pending.map(_.tsUs).min / 1000L,
        st.getCurrentWatermarkMs() + 1L))
    // nothing pending: no timeout — the carried ref tail is O(1) and
    // must survive silence to enrich a much-later probe
    out.iterator
  }

  private[streaming] def asOfStep(refType: String,
      toleranceMicros: Option[Long])(
      userId: Long, it: Iterator[TransEvent],
      st: GroupState[AsOfState]): Iterator[AsOfEmit] =
    coreStep(toleranceMicros,
      it.map(e => AsOfEv(tsUs(e.ts), e.event_id, e.event_type == refType)),
      st).map(c => AsOfEmit(c.event_id, userId, c.ts,
        c.ref_event_id, c.ref_ts))

  /** Point-in-time enrichment of the `probeType` rows of a
    * type-tagged event stream against its `refType` rows, finalized
    * at the watermark. `watermarkDelay` must bound the arrival
    * disorder of BOTH sides (the [[StreamingFeatures]] admission
    * contract). Rows of any other `event_type` are ignored, so a
    * union of two independently produced streams tags itself with
    * two literals and passes straight through. */
  def asOfEnrich(events: Dataset[TransEvent], refType: String,
      probeType: String, watermarkDelay: String,
      toleranceMicros: Option[Long] = None): Dataset[AsOfEmit] = {
    require(refType != probeType,
      "refType and probeType must differ (the tag IS the side)")
    toleranceMicros.foreach(t =>
      require(t > 0, "toleranceMicros must be positive"))
    import events.sparkSession.implicits._
    // watermark BELOW the type filter: rows of foreign types (e.g. a
    // replay's watermark-push sentinels) must still advance the
    // watermark before being shed; rows keep their TransEvent shape
    // end-to-end so the event-time column survives to the stateful
    // operator, and the side tag is resolved inside the step
    events.withWatermark("ts", watermarkDelay)
      .filter(e =>
        e.event_type == refType || e.event_type == probeType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        asOfStep(refType, toleranceMicros))
  }

  /** Column names [[asOfEnrichRows]] appends to the key columns. */
  private val CoreEmitCols = Seq("event_id", "ts", "ref_event_id", "ref_ts")

  /** Composite-key face of [[asOfEnrich]] — the streaming twin of the
    * batch `AsOfJoin.asOf(keys: Seq[String], …)` surface
    * ([[graft.ops.AsOfJoin]]): a (user, region)- or (entity, shard)-
    * keyed stream is hash-partitioned on ALL key columns, so an
    * entity-only match can never enrich across regions (the
    * composite-key batch contract pinned in AsOfJoinSpec). Same state
    * machine, same single shuffle — the key is carried as one struct
    * through `flatMapGroupsWithState` and re-expanded on emit, so key
    * arity never touches the per-key state size.
    *
    * `events` must carry a TIMESTAMP `tsCol`, a LONG `idCol` (unique
    * per event — the deterministic tie-breaker), a STRING `typeCol`
    * (the side tag), and the key columns; output = key columns +
    * (event_id, ts, ref_event_id, ref_ts), one row per finalized
    * probe (left-outer). The side filter is a TYPED (lambda) filter
    * deliberately: a Column filter would be pushed below
    * `EventTimeWatermark` and shed foreign-type rows (e.g. a replay's
    * watermark-push sentinels) BEFORE they advance the watermark.
    */
  def asOfEnrichRows(events: DataFrame, keys: Seq[String],
      refType: String, probeType: String, watermarkDelay: String,
      toleranceMicros: Option[Long] = None,
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(keys.nonEmpty, "asOfEnrichRows needs at least one key column")
    require(refType != probeType,
      "refType and probeType must differ (the tag IS the side)")
    toleranceMicros.foreach(t =>
      require(t > 0, "toleranceMicros must be positive"))
    val clash = keys.filter(CoreEmitCols.contains)
    require(clash.isEmpty, s"key columns ${clash.mkString(", ")} collide " +
      s"with the emitted columns (${CoreEmitCols.mkString(", ")})")
    val schema = events.schema
    val tsIdx = RowFaces.timestampField(schema, tsCol)
    val idIdx = RowFaces.fieldOfType(schema, idCol, LongType)
    val typeIdx = RowFaces.fieldOfType(schema, typeCol, StringType)
    val keyIdx = keys.map(schema.fieldIndex)
    implicit val keyEnc: Encoder[Row] =
      Encoders.row(StructType(keyIdx.map(schema(_))))
    implicit val outEnc: Encoder[(Row, AsOfCoreEmit)] =
      Encoders.tuple(keyEnc, Encoders.product[AsOfCoreEmit])
    implicit val stateEnc: Encoder[AsOfState] = Encoders.product[AsOfState]
    events.withWatermark(tsCol, watermarkDelay)
      .filter((r: Row) => { // typed on purpose — see scaladoc
        val t = r.getString(typeIdx)
        t == refType || t == probeType
      })
      .groupByKey((r: Row) => Row.fromSeq(keyIdx.map(r.get)): Row)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (k: Row, it: Iterator[Row], st: GroupState[AsOfState]) =>
          coreStep(toleranceMicros,
            it.map(r => AsOfEv(RowFaces.tsMicros(r, tsIdx, tsCol),
              r.getLong(idIdx), r.getString(typeIdx) == refType)),
            st).map(c => (k, c))
      }
      .select(keys.map(k => col(s"_1.`$k`").as(k)) ++
        CoreEmitCols.map(c => col(s"_2.`$c`").as(c)): _*)
  }
}
