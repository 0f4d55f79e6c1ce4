package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A raw event row (mirrors the events table schema). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** A closed user session. */
case class Session(user_id: Long, session_id: Long, n_events: Long,
                   sess_start: Timestamp, sess_end: Timestamp)

private case class SessionState(sessionId: Long, startMs: Long, lastMs: Long, count: Long)

/** One funnel-progress emission: the key just attained `step` (1-based)
  * of the configured chain at event time `t_step`. `correction = true`
  * marks a SUPERSEDING row: a late straggler tightened an already
  * emitted step time (append streams cannot retract, so the correction
  * rides as a second row — downstream keeps the minimum `t_step` per
  * (user_id, step), which corrections only ever lower).
  */
case class FunnelProgress(user_id: Long, step: Int, step_name: String,
                          t_step: Timestamp, correction: Boolean = false)

/** A step-typed event the funnel REJECTED against state that a later
  * correction might revise: kept (bounded) so corrections can
  * re-qualify it — the r16-documented miss, closed.
  */
private case class FunnelBuf(tsMs: Long, nanos: Int, eventId: Long,
                             step: Int)

private case class FunnelState(timesMs: Seq[Long], lastMs: Long,
                               buf: Seq[FunnelBuf] = Seq.empty)

/** One streaming attribution emission: `touch_event_id` (of
  * `touch_type`) earned `credit_ppm` toward conversion
  * `conv_event_id` — the per-conversion grain; a dashboard aggregates
  * by touch_type to recover the batch report.
  */
case class TouchCredit(user_id: Long, conv_event_id: Long,
                       touch_event_id: Long, touch_type: String,
                       credit_ppm: Long)

private case class AttributionState(tsUs: Seq[Long], eventId: Seq[Long],
                                    touchType: Seq[String], lastMs: Long)

/** One CLOSED SCD2 version from the stream: the key held `status` over
  * [valid_from, valid_to) — the half-open interval contract of the
  * batch [[graft.operators.Temporal.validityIntervals]]; the OPEN
  * (current) version lives in state and closes when the next change
  * arrives (append sinks can't update a previously emitted open row).
  */
case class ScdVersion(user_id: Long, status: String, valid_from: Timestamp,
                      valid_to: Timestamp, version: Long)

private case class ScdState(status: String, fromMs: Long, fromNanos: Int,
                            version: Long, lastMs: Long)

/** One streaming rate-anomaly emission: the key's `bucket` closed with
  * `n_events`, deviating > k·σ from its trailing window (sum
  * `trailing_sum`) — row-identical to the batch
  * [[graft.operators.EventOps.rateAnomalies]] on ordered streams.
  */
case class RateAnomaly(event_type: String, bucket: Timestamp,
                       n_events: Long, trailing_sum: Long)

private case class RateState(openStarts: Seq[Long], openCounts: Seq[Long],
                             ringStarts: Seq[Long], ringCounts: Seq[Long],
                             lastMs: Long)

/** Structured Streaming mirrors of the batch event analytics
  * (graft.queries.Events): same semantics, incremental execution.
  *
  * Scale: state is keyed by (window × type) or user_id — bounded by the
  * watermark, sharded across executors by the state-store partitioning.
  */
object EventStreams {

  /** Tumbling-window counts/sums with a watermark; append-mode emits each
    * window once, when the watermark passes it (the streaming twin of
    * e01_tumbling).
    */
  def tumbling(events: DataFrame, windowLen: String = "5 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(value AS DECIMAL(18,2))")).cast("double").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session closes when event time advances
    * more than `gapSec` past its last event — proven either by a later
    * event in the stream (emitted immediately) or by the watermark passing
    * the session's horizon (event-time timeout) — the streaming twin of
    * e02_sessionize.
    *
    * State is bounded: every state entry always carries an event-time
    * timeout. An open session times out (and is emitted as closed) once the
    * watermark passes lastEvent + gap; what remains is a 32-byte numbering
    * tombstone that preserves the user's session_id continuity until
    * `retentionSec` of event time passes without activity, after which the
    * user is forgotten entirely (a later event restarts at session 1).
    *
    * Ordering: events are sorted by event time within each micro-batch, and
    * events older than the watermark are dropped by Spark before reaching
    * the state function. A straggler that arrives in a later micro-batch
    * but is newer than the watermark is appended to the user's current
    * session in arrival order — exact event-time placement of such
    * stragglers would require buffering every session until the watermark
    * horizon; this operator trades that for immediate emission.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
                 watermark: String = "30 minutes",
                 retentionSec: Long = 7L * 86400): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            if (st.count > 0) {
              // watermark passed lastMs+gap: no event can extend this
              // session any more — emit it and keep a numbering tombstone
              state.update(SessionState(st.sessionId + 1, st.lastMs, st.lastMs, 0L))
              // clamp past the watermark: a retention shorter than the
              // watermark delay must not set an already-expired timeout,
              // which GroupStateImpl rejects and fails the query
              state.setTimeoutTimestamp(math.max(st.lastMs + retentionSec * 1000,
                state.getCurrentWatermarkMs() + 1))
              Iterator.single(Session(userId, st.sessionId, st.count,
                new Timestamp(st.startMs), new Timestamp(st.lastMs)))
            } else {
              state.remove() // tombstone expired: forget the user
              Iterator.empty
            }
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) st = SessionState(1L, t, t, 1L)
              else if (st.count == 0L) st = SessionState(st.sessionId, t, t, 1L)
              else if (t - st.lastMs > gapSec * 1000) {
                closed += Session(userId, st.sessionId, st.count,
                  new Timestamp(st.startMs), new Timestamp(st.lastMs))
                st = SessionState(st.sessionId + 1, t, t, 1L)
              } else st = st.copy(lastMs = t, count = st.count + 1)
            }
            if (st != null) {
              state.update(st)
              // +1: an event at exactly lastMs+gap still belongs here;
              // clamped past the watermark like the tombstone timeout
              state.setTimeoutTimestamp(math.max(st.lastMs + gapSec * 1000 + 1,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Streaming N-step conversion funnel — the incremental twin of
    * [[graft.operators.EventOps.funnel]]: per key, one [[FunnelProgress]]
    * row the moment a step is attained (step k's event strictly after
    * step k−1's time and within `withinSeconds` of it, first touch).
    * On an event-time-ordered stream the emitted step times are exactly
    * the batch funnel's (spec-pinned); each micro-batch's rows are
    * folded in (ts, event_id) order so within-batch disorder never
    * matters. Cross-batch stragglers: an EARLIER qualifying event
    * arriving late tightens the stored step time whenever the chain
    * above it is not yet anchored (the next step unattained — a later
    * step's time was gated on the OLD value and stays truthful), and
    * the tightening is SURFACED as a `correction = true` row for the
    * same (key, step): append-mode streams cannot retract an emitted
    * row, so the correction supersedes it instead — downstream keeps
    * the minimum `t_step` per (key, step), which corrections only ever
    * lower. Corrections also RE-EVALUATE rejected events (round 17,
    * closing the r16-documented miss): every step-typed event rejected
    * against state a later correction might revise — its step unanchored,
    * or a potential tightener gated by a stale anchor — is kept in a
    * BOUNDED per-key buffer, and whenever a batch changes an anchor the
    * buffer replays (in event order, to a fixpoint ≤ steps passes) so a
    * correction can anchor a step whose event arrived before it. The
    * buffer holds only events that could still matter: entries below
    * the watermark are pruned (a correction cascade's new anchor values
    * are always ≥ the watermark — stragglers are — so sub-watermark
    * entries can never re-qualify: provable by induction up the chain),
    * entries whose step anchored at or below their time are never
    * admitted, and `maxBuffered` caps the rest (keeping the earliest;
    * overflow degrades to the pre-r17 behavior for the dropped tail).
    * Exact replay of heavily disordered history beyond the buffer
    * remains the batch operator's job (the sessionize contract).
    *
    * State per key: `steps.size` longs + a timestamp + the bounded
    * buffer, dropped `retentionSec` after the key's last event
    * (event-time timeout) — bounded by active keys in the horizon,
    * sharded by the state store.
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   withinSeconds: Long, watermark: String = "1 hour",
                   retentionSec: Long = 7L * 86400,
                   maxBuffered: Int = 512): Dataset[FunnelProgress] = {
    require(steps.size >= 2, s"funnel needs >= 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    require(withinSeconds > 0, s"withinSeconds=$withinSeconds")
    require(maxBuffered >= 0, s"maxBuffered=$maxBuffered")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    events
      .filter(e => stepIdx.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val times = state.getOption.map(_.timesMs.toArray)
              .getOrElse(Array.fill(nSteps)(-1L))
            var lastMs = state.getOption.map(_.lastMs).getOrElse(-1L)
            val buf = scala.collection.mutable.ArrayBuffer.empty[FunnelBuf]
            state.getOption.foreach(buf ++= _.buf)
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelProgress]
            var changed = false
            // (ts, tie)-ordered qualification of one event against the
            // current anchors; returns true iff it changed an anchor
            def tryQualify(t: Long, k: Int, tsOut: Timestamp): Boolean = {
              val prevOk = k == 0 || (times(k - 1) >= 0 &&
                t > times(k - 1) && t <= times(k - 1) + withinSeconds * 1000)
              if (times(k) < 0) {
                if (prevOk) {
                  times(k) = t
                  out += FunnelProgress(userId, k + 1, steps(k), tsOut,
                    correction = false)
                  true
                } else false
              } else if (t < times(k) && prevOk &&
                  (k == nSteps - 1 || times(k + 1) < 0)) {
                // late straggler tightens an EMITTED step: allowed only
                // while the next step is unanchored (a later step's time
                // was gated on the old value and must stay truthful) —
                // and surfaced as a correction row, not silently
                times(k) = t
                out += FunnelProgress(userId, k + 1, steps(k), tsOut,
                  correction = true)
                true
              } else false
            }
            // a rejected event is worth buffering iff a future
            // correction could revise the state it was judged against
            def bufferable(t: Long, k: Int): Boolean =
              times(k) < 0 ||
                (t < times(k) && (k == nSteps - 1 || times(k + 1) < 0))
            for (e <- rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              val t = e.ts.getTime
              lastMs = math.max(lastMs, t)
              val k = stepIdx(e.event_type)
              if (tryQualify(t, k, e.ts)) changed = true
              else if (bufferable(t, k))
                buf += FunnelBuf(t, e.ts.getNanos, e.event_id, k)
            }
            // re-evaluation: replay the buffer whenever an anchor moved,
            // to a fixpoint — each pass either changes an anchor (≤
            // nSteps times total) or stops
            var progress = changed
            while (progress) {
              progress = false
              val ordered = buf.sortBy(b => (b.tsMs, b.eventId)).toSeq
              for (b <- ordered) {
                val ts = new Timestamp(b.tsMs)
                ts.setNanos(b.nanos)
                if (tryQualify(b.tsMs, b.step, ts)) {
                  buf -= b
                  progress = true
                }
              }
            }
            // prune: sub-watermark entries can never re-qualify; entries
            // no longer bufferable (their step anchored at/below their
            // time, or tightening got sealed) are dead weight; cap keeps
            // the earliest (ts, tie) entries
            val wm = state.getCurrentWatermarkMs()
            val kept = buf.filter(b => b.tsMs >= wm && bufferable(b.tsMs, b.step))
              .sortBy(b => (b.tsMs, b.eventId)).take(maxBuffered).toSeq
            state.update(FunnelState(times.toSeq, lastMs, kept))
            state.setTimeoutTimestamp(math.max(lastMs + retentionSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming DEBOUNCE — [[graft.operators.EventOps.debounce]]'s
    * incremental twin: emit an event iff the key's previous RAW event
    * (same stateless contract as the batch operator) is more than
    * `cooldownSeconds` older. State is ONE timestamp per key, dropped
    * `retentionSec` of event time after the key's last event;
    * within-batch disorder is absorbed by the (ts, event_id) sort. A
    * cross-batch straggler older than the stored last-event time is
    * evaluated against that newer time (it gets suppressed) and never
    * rewinds state — append streams don't retract already-emitted rows
    * and the batch operator would have re-evaluated the whole
    * neighborhood; exact disordered replay is its job (the sessionize
    * contract).
    */
  def debounceStream(events: Dataset[Event], cooldownSeconds: Long,
                     watermark: String = "1 hour",
                     retentionSec: Long = 7L * 86400): Dataset[Event] = {
    require(cooldownSeconds > 0, s"cooldownSeconds=$cooldownSeconds")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var lastMs = state.getOption.getOrElse(Long.MinValue)
            val out = scala.collection.mutable.ArrayBuffer.empty[Event]
            for (e <- rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              val t = e.ts.getTime
              if (lastMs == Long.MinValue || t - lastMs > cooldownSeconds * 1000)
                out += e
              // vs previous RAW event: state advances whether or not
              // the event was emitted — the batch operator's contract
              lastMs = math.max(lastMs, t)
            }
            state.update(lastMs)
            state.setTimeoutTimestamp(math.max(lastMs + retentionSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming KEPT-CHAIN debounce — the incremental twin of
    * [[graft.operators.EventOps.debounceChain]]: emit an event iff it is
    * more than `cooldownSeconds` after the key's last EMITTED event (the
    * true-cooldown rate-limiter contract — state only advances on a
    * keep, so a steady drizzle re-fires once per window instead of
    * being suppressed forever). State is ONE timestamp per key — the
    * last KEPT one — which is exactly the batch fold's O(1) register,
    * so on an event-time-ordered stream the output row set equals the
    * batch operator's (spec-pinned parity). Cross-batch stragglers
    * older than the stored kept time are evaluated against it and never
    * rewind state (the sessionize contract: exact disordered replay is
    * the batch operator's job). The gap test is the same pure-integer
    * microseconds comparison as the batch side.
    */
  def debounceChainStream(events: Dataset[Event], cooldownSeconds: Long,
                          watermark: String = "1 hour",
                          retentionSec: Long = 7L * 86400): Dataset[Event] = {
    require(cooldownSeconds > 0, s"cooldownSeconds=$cooldownSeconds")
    val cooldownUs = cooldownSeconds * 1000000L
    import events.sparkSession.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var lastKeptUs = state.getOption.getOrElse(Long.MinValue)
            var lastSeenUs = lastKeptUs
            val out = scala.collection.mutable.ArrayBuffer.empty[Event]
            for (e <- rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              val us = micros(e.ts)
              lastSeenUs = math.max(lastSeenUs, us)
              if (lastKeptUs == Long.MinValue || us - lastKeptUs > cooldownUs) {
                out += e
                // kept-chain contract: state advances ONLY on a keep
                lastKeptUs = us
              }
            }
            state.update(lastKeptUs)
            state.setTimeoutTimestamp(math.max(
              lastSeenUs / 1000L + retentionSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming MULTI-TOUCH attribution — the incremental twin of
    * [[graft.operators.Attribution.report]]: per key, touch events
    * buffer (bounded) until the key's next conversion arrives, at which
    * point the qualifying touches (strictly before, within the
    * lookback) are ranked and credited with the SAME integer-ppm
    * arithmetic as the batch operator and emitted as one
    * [[TouchCredit]] row each — the per-conversion grain a live credit
    * dashboard aggregates. Every conversion CONSUMES all buffered
    * touches at or before it (credited or too stale), matching the
    * batch next-conversion-only contract, so on an event-time-ordered
    * stream the aggregated credits equal the batch report
    * (spec-pinned). State: the touch buffer (capped at `maxBuffered`,
    * keeping the LATEST — the ones the next conversion credits),
    * dropped `retentionSec` after the key's last event; cross-batch
    * stragglers follow the sessionize contract (evaluated against
    * current state, never rewound).
    */
  def attributionStream(events: Dataset[Event], conversionType: String,
                        touchTypes: Seq[String], lookbackSeconds: Long,
                        model: String = "position",
                        watermark: String = "1 hour",
                        retentionSec: Long = 7L * 86400,
                        maxBuffered: Int = 1024): Dataset[TouchCredit] = {
    require(touchTypes.nonEmpty, "attributionStream: no touch types")
    require(!touchTypes.contains(conversionType),
      s"attributionStream: conversion type '$conversionType' cannot be a touch")
    require(lookbackSeconds > 0, s"lookbackSeconds=$lookbackSeconds")
    require(model == "position" || model == "linear",
      s"attribution model '$model' (position | linear)")
    require(maxBuffered >= 1, s"maxBuffered=$maxBuffered")
    import events.sparkSession.implicits._
    val touchSet = touchTypes.toSet
    val lookbackUs = lookbackSeconds * 1000000L
    def micros(ts: Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .filter(e => touchSet.contains(e.event_type) ||
        e.event_type == conversionType)
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttributionState, TouchCredit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[AttributionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val buf = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, String)] // (tsUs, eventId, type)
            state.getOption.foreach(s =>
              buf ++= s.tsUs.lazyZip(s.eventId).lazyZip(s.touchType))
            var lastMs = state.getOption.map(_.lastMs).getOrElse(-1L)
            val out = scala.collection.mutable.ArrayBuffer.empty[TouchCredit]
            for (e <- rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              lastMs = math.max(lastMs, e.ts.getTime)
              val us = micros(e.ts)
              if (e.event_type == conversionType) {
                // the conversion consumes every touch at or before it:
                // qualifying ones get credited, stale ones are spent
                // (next-conversion-only, the batch contract)
                val (before, after) = buf.partition(_._1 < us)
                val qual = before
                  .filter(t => us - t._1 <= lookbackUs)
                  .sortBy(t => (t._1, t._2))
                val n = qual.size
                qual.zipWithIndex.foreach { case ((_, tid, tt), i) =>
                  out += TouchCredit(userId, e.event_id, tid, tt,
                    graft.operators.Attribution.creditPpm(model, i + 1L, n))
                }
                buf.clear(); buf ++= after
              } else {
                buf += ((us, e.event_id, e.event_type))
              }
            }
            val kept = buf.sortBy(t => (t._1, t._2)).takeRight(maxBuffered)
            state.update(AttributionState(kept.map(_._1).toSeq,
              kept.map(_._2).toSeq, kept.map(_._3).toSeq, lastMs))
            state.setTimeoutTimestamp(math.max(lastMs + retentionSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming SCD2 — the incremental twin of
    * [[graft.operators.Temporal.validityIntervals]] with `event_type`
    * as the tracked attribute: per key, consecutive same-status events
    * COLLAPSE (no-op updates never version), and a status CHANGE closes
    * the open version — emitting one [[ScdVersion]] row with
    * `valid_to` = the change's event time (half-open, the batch
    * contract) — and opens the next. On an event-time-ordered stream
    * the emitted rows equal the batch operator's CLOSED versions
    * (`is_current = 0` rows; spec-pinned): the open version is state,
    * not output, because an append sink cannot update it — a live
    * "current status" view is [[graft.operators.Temporal.snapshotAt]]
    * over the batch frame, or this stream's state store. Cross-batch
    * stragglers follow the sessionize contract (evaluated against the
    * open version, never rewound). State per key: one (status,
    * valid_from, version) triple + a timestamp, dropped `retentionSec`
    * after the key's last event.
    */
  def scd2Stream(events: Dataset[Event], watermark: String = "1 hour",
                 retentionSec: Long = 7L * 86400): Dataset[ScdVersion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdVersion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[ScdState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[ScdVersion]
            for (e <- rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              if (st == null) {
                st = ScdState(e.event_type, e.ts.getTime, e.ts.getNanos,
                  1L, e.ts.getTime)
              } else if (e.event_type != st.status) {
                val from = new Timestamp(st.fromMs)
                from.setNanos(st.fromNanos)
                out += ScdVersion(userId, st.status, from, e.ts, st.version)
                st = ScdState(e.event_type, e.ts.getTime, e.ts.getNanos,
                  st.version + 1, math.max(st.lastMs, e.ts.getTime))
              } else {
                st = st.copy(lastMs = math.max(st.lastMs, e.ts.getTime))
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.lastMs + retentionSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming RATE-ANOMALY detection — the incremental twin of
    * [[graft.operators.EventOps.rateAnomalies]]: per event type, event
    * counts accumulate in OPEN epoch-aligned buckets; when the
    * watermark passes a bucket's end it CLOSES (in bucket order), is
    * judged against the trailing ring of the last `trailing` closed
    * buckets with the SAME cross-multiplied integer z-test —
    * (n·c − S)² > k²·(n·Sq − S²), pure longs, zero float — and joins
    * the ring. Zero-event buckets don't exist (the batch
    * observed-buckets contract), a bucket is judged only when the ring
    * is FULL (cold starts never alarm), and on ordered streams the
    * emitted rows equal the batch report (spec-pinned).
    *
    * State per key: ≤ horizon/width open (bucket, count) pairs + the
    * `trailing`-bucket ring + a timestamp; an event-time timeout fires
    * at the earliest open bucket's close (so quiet keys still flush)
    * and drops the key entirely `retentionSec` after its last event.
    */
  def rateAnomalyStream(events: Dataset[Event],
                        bucketWidthSeconds: Long = 300, trailing: Int = 12,
                        k: Long = 3, watermark: String = "1 hour",
                        retentionSec: Long = 7L * 86400): Dataset[RateAnomaly] = {
    require(bucketWidthSeconds > 0, s"bucketWidthSeconds=$bucketWidthSeconds")
    require(trailing >= 2, s"trailing=$trailing")
    require(k >= 1, s"k=$k")
    import events.sparkSession.implicits._
    val widthMs = bucketWidthSeconds * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateState, RateAnomaly](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[RateState]) =>
          val open = scala.collection.mutable.SortedMap.empty[Long, Long]
          val ring = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var lastMs = -1L
          state.getOption.foreach { s =>
            open ++= s.openStarts.zip(s.openCounts)
            ring ++= s.ringStarts.zip(s.ringCounts)
            lastMs = s.lastMs
          }
          for (e <- rows) {
            val t = e.ts.getTime
            lastMs = math.max(lastMs, t)
            val b = math.floorDiv(t, widthMs) * widthMs
            open(b) = open.getOrElse(b, 0L) + 1L
          }
          val wm = state.getCurrentWatermarkMs()
          val out = scala.collection.mutable.ArrayBuffer.empty[RateAnomaly]
          // close every open bucket the watermark has passed, in order:
          // judge against the ring BEFORE it joins (the batch
          // (-trailing, -1) rows frame), then rotate
          for (b <- open.keys.toSeq.sorted if b + widthMs <= wm) {
            val c = open.remove(b).get
            if (ring.size == trailing) {
              val n = trailing.toLong
              val s = ring.map(_._2).sum
              val sq = ring.map(r => r._2 * r._2).sum
              val lhs = (n * c - s) * (n * c - s)
              val rhs = k * k * (n * sq - s * s)
              if (lhs > rhs)
                out += RateAnomaly(key, new Timestamp(b), c, s)
            }
            ring += ((b, c))
            if (ring.size > trailing) ring.remove(0)
          }
          if (state.hasTimedOut && open.isEmpty &&
            wm > lastMs + retentionSec * 1000) {
            state.remove()
          } else {
            state.update(RateState(open.keys.toSeq, open.values.toSeq,
              ring.map(_._1).toSeq, ring.map(_._2).toSeq, lastMs))
            // wake at the earliest open close so quiet keys still flush;
            // otherwise hold until retention expiry
            val next = open.keys.minOption.map(_ + widthMs)
              .getOrElse(lastMs + retentionSec * 1000)
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.iterator
      }
  }

  /** Streaming per-batch TRANSITION matrix — the monitoring face of
    * [[graft.operators.EventOps.transitionMatrix]] ("what does behavior
    * look like in THIS ingest window — did click→purchase collapse?"),
    * via foreachBatch → the batch core (the heavyHittersStream pattern:
    * the matrix needs the whole window's pairs, a per-window statement
    * by design; corpus-lifetime transitions are the batch operator's job
    * over the accumulated table). On an event-time-ordered stream whose
    * batch covers the window, the report row-equals the batch operator
    * on the same rows (spec-pinned). Each row carries the batch id.
    */
  def transitionsStream(events: Dataset[Event])(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.operators.EventOps.transitionMatrix(batch,
              "user_id", "event_type", "ts", "event_id")
            .withColumn("batch_id", lit(batchId)).localCheckpoint(true))
        }
      }
      .start()

  /** Streaming per-batch DAU/WAU STICKINESS probe — the live face of
    * [[graft.operators.EventOps.stickiness]]: each micro-batch reports
    * the sliding daily/weekly-active ratio over ITS OWN window (the
    * dashboard probe between full batch refreshes), via foreachBatch →
    * the batch core. Per-batch semantics are the point — wau counts the
    * 7-day windows covered by the batch's activity days; the
    * corpus-lifetime ratio is the batch operator's job. Row-equals the
    * batch operator on the same rows (spec-pinned); rows carry batch_id.
    */
  def stickinessStream(events: Dataset[Event])(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.operators.EventOps.stickiness(batch, "user_id", "ts")
            .withColumn("batch_id", lit(batchId)).localCheckpoint(true))
        }
      }
      .start()

  /** Streaming per-batch CO-OCCURRENCE probe — the monitoring face of
    * [[graft.operators.Cooccurrence]] ("did the view↔purchase affinity
    * collapse in THIS ingest window?"): foreachBatch → the batch core
    * over (user, day) baskets built from the batch's own rows, the e28
    * grain. Per-window semantics are the point — corpus-lifetime
    * affinities are the batch operator's job over the accumulated
    * table. Row-equals the batch core on the same rows (spec-pinned);
    * rows carry batch_id.
    */
  def cooccurrenceStream(events: Dataset[Event], maxBasket: Int = 4,
                         minSupport: Long = 1L)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.operators.Cooccurrence.pairs(
              batch.withColumn("__b",
                concat_ws(":", col("user_id"), col("ts").cast("date"))),
              "__b", "event_type", maxBasket, minSupport)
            .withColumn("batch_id", lit(batchId)).localCheckpoint(true))
        }
      }
      .start()

  /** STREAMING materialized-aggregate maintenance — the live face of
    * [[graft.sources.Warehouse.createAggRegistry]]'s c12 triple: each
    * micro-batch appends its partial (n, sum, min, max) states to the
    * bucketed registry (key-cardinality rows — the batch is aggregated
    * BEFORE it touches the table) and the sink receives the refreshed
    * zero-exchange snapshot. Exactly-once caveat (documented, the
    * registry-append family's contract): the append is idempotent only
    * per batch file set — a replayed batch after a crash between append
    * and checkpoint double-counts; production pairs this with the
    * foreachBatch batchId-dedup idiom (skip batchIds at or below the
    * table's recorded high-water mark).
    */
  def aggRegistryStream(events: Dataset[Event], table: String,
                        keyCol: String = "event_type",
                        valueCol: String = "value")
                       (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sources.Warehouse.appendAggDelta(
            batch, keyCol, valueCol, table)
          sink(graft.sources.Warehouse
            .aggSnapshot(batch.sparkSession, table)
            .withColumn("batch_id", lit(batchId)).localCheckpoint(true))
        }
      }
      .start()

  /** Streaming exact dedup: drop rows whose content hash was already seen
    * within the watermark window — the incremental twin of
    * [[graft.dedup.Dedup.exact]]. State is one 32-byte hash per distinct
    * document inside the watermark horizon, keyed-sharded across the
    * cluster's state stores.
    */
  def dedupeExact(df: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    df.withColumn("__h", sha2(col(textCol).cast("binary"), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Native gap-sessionization via `session_window` — preference (a) of the
    * custom-operator ladder: when only per-session aggregates are needed
    * (not lifetime session numbering), Spark's built-in session window
    * handles state, merging, and watermark expiry with zero custom state
    * code. Append mode emits each session once the watermark closes it.
    */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(value AS DECIMAL(18,2))")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"), col("sum_value"))

  /** Streaming near-dup drop: a row is dropped when its 64-bit SimHash
    * (optionally with the `ignoreBits` lowest bits cleared — bit-sampling
    * LSH, so docs within that Hamming radius on the low bits collapse)
    * collides with one already seen inside the watermark horizon — the
    * incremental twin of the SimHash batch path
    * ([[graft.dedup.Dedup.simhash]]). State is one 8-byte signature per
    * distinct surviving document inside the horizon, expired by the
    * watermark exactly like [[dedupeExact]].
    */
  def dedupeNear(df: DataFrame, textCol: String, tsCol: String,
                 watermark: String = "1 hour", ignoreBits: Int = 0): DataFrame = {
    val sig = graft.dedup.Dedup.simhash(col(textCol))
    val masked =
      if (ignoreBits > 0) sig.bitwiseAND(lit(~((1L << ignoreBits) - 1)))
      else sig
    df.withColumn("__sh", masked)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sh")
      .drop("__sh")
  }

  /** Streaming BANDED near-dedup — the incremental twin of the batch
    * MinHash-LSH candidate path ([[graft.dedup.Dedup.minhashCandidates]]),
    * where [[dedupeNear]]'s single-signature state only catches
    * identical-signature (or masked-bit-radius) duplicates: a document is
    * a near-dup if ANY of its `bands` MinHash band buckets collides with
    * one seen inside the watermark horizon, which is exactly L2's recall
    * curve (a mutated near-dup agrees with the original on some band with
    * high probability even though the full signatures differ).
    *
    * Two chained stateful stages (Spark's supported
    * flatMapGroupsWithState-in-append → windowed-aggregation chain):
    *
    *  1. Band state, keyed by the (band, bucket) composite (mirroring the
    *     batch path's posexplode keying, so a cross-band 64-bit hash
    *     collision cannot merge different bands' buckets): the first batch
    *     to present a bucket elects the batch's minimum-id row as that
    *     bucket's WINNER and registers the bucket in state (expired by
    *     event-time timeout `retentionSec` past the bucket's last
    *     sighting); later batches — and same-batch non-winners — collide.
    *     The min-id election is what makes same-batch duplicates
    *     deterministic: all buckets of a pair of identical docs elect the
    *     SAME winner, so exactly one of the pair survives (the
    *     nondeterministic alternative — per-bucket arbitrary first-writer —
    *     can split winners across the pair and drop both).
    *
    *     This stage shuffles SKELETONS only — (id, ts, band, bucket) rows,
    *     ~32 bytes, never the document payload (see [[bandSkeletons]]) —
    *     and folds each group in a single pass without materializing it.
    *     Band-bucket keys are skewable (a boilerplate flood funnels every
    *     copy of the hot bucket into one task), so this is the same
    *     discipline the batch candidate stage and the semantic-dedup
    *     windows follow: heavy columns never ride a skewable partition.
    *  2. Per-document verdict: a document survives only if ALL `bands` of
    *     its buckets elected it (any collision ⇒ near-dup ⇒ dropped) — a
    *     count over the doc's emitted band-winner skeletons, grouped with
    *     a tumbling `windowLen` window so the verdict state is
    *     watermark-bounded. The document payload re-enters HERE, exactly
    *     once per doc, as a zero-count union branch keyed by the unskewed
    *     (window, id) — a streaming aggregation may not feed a
    *     stream-stream join, so the payload join-back is expressed as
    *     `first(payload, ignoreNulls)` over the union instead. In append
    *     mode the verdict emits once the watermark passes the document's
    *     window — bounded intake latency, not immediate.
    *
    * Like the batch candidate stage, EVERY document's buckets enter the
    * state, dropped documents' included: a doc that loses band b to doc A
    * still registers its fresh band c (it is c's only contender, hence
    * c's winner), so a later doc colliding only with c is dropped too —
    * the streaming mirror of batch clusters resolving transitively
    * through documents that are themselves dropped.
    *
    * Requires `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false` on the session: Spark's global-watermark check
    * rejects any flatMapGroupsWithState feeding a stateful operator
    * because it cannot prove what timestamps the user function emits.
    * Stage 1 only ever re-emits its INPUT rows (winner election, no
    * timestamp arithmetic), so its output is never later than the
    * watermark that already admitted those rows — the conservative check
    * does not apply to this shape.
    */
  def dedupeNearBanded(docs: DataFrame, textCol: String, idCol: String,
                       tsCol: String, watermark: String = "1 hour",
                       windowLen: String = "5 minutes",
                       shingleK: Int = 3, numHashes: Int = 64,
                       bands: Int = 16,
                       retentionSec: Long = 3600L,
                       indexTable: Option[String] = None,
                       minEstJaccard: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StructType
    require(numHashes % bands == 0, "bands must divide numHashes")
    val cols = docs.columns.toSeq
    val wmDocs = docs.withWatermark(tsCol, watermark)
    val skel = bandSkeletons(wmDocs, textCol, idCol, tsCol,
      shingleK, numHashes, bands)
    val winnerSchema = StructType(
      skel.schema.filter(f => f.name == idCol || f.name == tsCol))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(winnerSchema)
    implicit val longEnc = Encoders.scalaLong
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val idIdx = skel.schema.fieldIndex(idCol)
    val tsIdx = skel.schema.fieldIndex(tsCol)
    val bandIdx = skel.schema.fieldIndex("__band")
    val bucketIdx = skel.schema.fieldIndex("__bucket")
    val elected = skel
      .groupByKey(r => (r.getInt(bandIdx), r.getLong(bucketIdx)))
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // min-id winner of this batch's contenders for the bucket,
            // under the SAME ordering the batch dedups use (numeric for
            // numbers, lexicographic for strings) so the two paths keep
            // the same representative of a pair
            def lt(x: Any, y: Any): Boolean = (x, y) match {
              case (a: Long, b: Long) => a < b
              case (a: Int, b: Int) => a < b
              case (a: String, b: String) => a < b
              case (a: java.lang.Number, b: java.lang.Number) =>
                a.doubleValue < b.doubleValue
              case _ => x.toString < y.toString
            }
            // single-pass fold over the (possibly hot-bucket-sized) group:
            // nothing is materialized, each row is a ~32-byte skeleton
            var lastMs = Long.MinValue
            var winId: Any = null
            var winTs: Timestamp = null
            for (r <- rows) {
              val t = r.getAs[Timestamp](tsIdx)
              if (t.getTime > lastMs) lastMs = t.getTime
              val id = r.getAs[Any](idIdx)
              if (winId == null || lt(id, winId)) { winId = id; winTs = t }
            }
            val seen = state.exists
            state.update(lastMs)
            // clamp: a late-but-admitted row (or a sub-watermark-delay
            // retention) must not set a timeout at/before the current
            // watermark, which GroupStateImpl rejects and fails the query
            state.setTimeoutTimestamp(math.max(lastMs + retentionSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            if (seen) Iterator.empty
            else Iterator.single(
              if (idIdx < tsIdx) Row(winId, winTs) else Row(winTs, winId))
          }
      }
    // Verdict + payload join-back in ONE id-keyed aggregation: winner
    // skeletons count 1 toward the per-doc band tally; the document's full
    // row rides a zero-count union branch (once per doc, no band fan-out)
    // and is recovered with first(ignoreNulls). Both branches carry the
    // doc's own ts, so they land in the same (window, id) group. With
    // `indexTable`, verified matches against the persisted (static)
    // MinHash index ride a third stateless branch into the SAME
    // aggregation — a chained second windowed verdict would emit
    // past-watermark rows into this one and be dropped as late, so the
    // cross-run probe fuses here instead (see [[dedupeNearAgainstIndex]]).
    val payload = wmDocs.select(col(idCol), col(tsCol), lit(0L).as("__n"),
      lit(0L).as("__m"), struct(cols.map(col): _*).as("__r"))
    val payloadType = payload.schema("__r").dataType
    val winners = elected.toDF()
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol), lit(1L).as("__n"), lit(0L).as("__m"),
        lit(null).cast(payloadType).as("__r"))
    val branches = indexTable match {
      case None => winners.unionByName(payload)
      case Some(t) =>
        val matched = indexMatchSkeletons(wmDocs, textCol, idCol, tsCol, t,
            minEstJaccard)
          .select(col(idCol), col(tsCol), lit(0L).as("__n"), lit(1L).as("__m"),
            lit(null).cast(payloadType).as("__r"))
        winners.unionByName(payload).unionByName(matched)
    }
    branches
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(sum(col("__n")).as("__n"), sum(col("__m")).as("__m"),
        first(col("__r"), ignoreNulls = true).as("__r"))
      .filter(col("__n") === bands && col("__m") === 0)
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Stage-1 input of [[dedupeNearBanded]]: one (id, ts, band, bucket)
    * SKELETON row per document band — the band-keyed state shuffle never
    * carries the text payload (package-visible so the spec can pin the
    * schema). Band buckets come from the exact batch band-key fold
    * ([[graft.dedup.Dedup.bandBucketsUdf]]) so collision semantics mirror
    * L2's, and the band index stays in the row so state can key on the
    * (band, bucket) composite exactly like the batch posexplode path.
    */
  private[graft] def bandSkeletons(docs: DataFrame, textCol: String,
                                   idCol: String, tsCol: String,
                                   shingleK: Int, numHashes: Int,
                                   bands: Int): DataFrame = {
    import graft.dedup.Dedup
    docs.select(col(idCol), col(tsCol),
      posexplode(Dedup.bandBucketsUdf(bands)(
        Dedup.minhashSignatureFromText(col(textCol), shingleK, numHashes)))
        .as(Seq("__band", "__bucket")))
  }

  /** Streaming probe of a persisted MinHash band index
    * ([[graft.dedup.Dedup.writeMinhashIndex]]): drop every stream document
    * with a verified near-dup ([[graft.dedup.Dedup.nearDupsAgainstIndex]]'s
    * est-Jaccard rule) anywhere in the indexed HISTORICAL corpus — the
    * incremental twin of the batch cross-run stage
    * ([[graft.dedup.Dedup.nearDedupAgainstIndex]], curate()'s
    * `nearIndexTable`). The index is STATIC here: per micro-batch the
    * day's documents are signed once, their band skeletons join the index
    * (a stream-static join — the stream side is the bounded micro-batch;
    * the index side is read in place, never mutated by the stream), each
    * candidate is verified against the id-bucketed signature sibling, and
    * the per-document verdict aggregates in a tumbling `windowLen` window
    * (survivors emit when the watermark passes their window — the bounded
    * intake latency of [[dedupeNearBanded]]). Growing the index stays a
    * batch job ([[graft.dedup.Dedup.appendToMinhashIndex]]), the same
    * incremental/compaction split as every other persisted tier.
    *
    * Scale shape: the document payload never rides the skewable
    * (band, bucket) join — it re-enters once per doc as the zero-count
    * union branch of the verdict aggregation, recovered with
    * `first(ignoreNulls)`. What DOES ride the band join is the batch
    * side's own 8-byte-component signature (needed for the verify — a
    * streaming aggregation cannot feed a stream-stream join-back by id),
    * numHashes × 8 B per band row of the day's batch: bounded by the
    * micro-batch, not the corpus, and the same read-volume trade the
    * batch probe makes by storing signatures instead of text.
    *
    * Composition constraint: this must be the LAST stateful stage of its
    * plan. The verdict emits a document's row once the watermark PASSES
    * its window, so every emitted row is late relative to the global
    * watermark — a downstream stateful operator (a dedup state store,
    * another aggregation) would discard it as late data. Upstream
    * same-batch stages (stateless maps, `dropDuplicatesWithinWatermark`,
    * which emits in the arrival batch) compose fine; to combine with
    * BANDED near-dedup use [[dedupeNearBanded]]'s `indexTable` option,
    * which fuses the probe into that operator's own verdict aggregation
    * instead of chaining two windowed verdicts.
    */
  def dedupeNearAgainstIndex(docs: DataFrame, textCol: String, idCol: String,
                             tsCol: String, table: String,
                             minEstJaccard: Double = 0.7,
                             watermark: String = "1 hour",
                             windowLen: String = "5 minutes"): DataFrame =
    indexProbeVerdict(docs.withWatermark(tsCol, watermark), textCol, idCol,
      tsCol, table, minEstJaccard, windowLen)

  // The probe verdict over an ALREADY-watermarked stream — split out so a
  // chain whose upstream stage declared the watermark (curateDocs' exact
  // path) doesn't redefine it, which Spark rejects under
  // multiple-stateful-operator support.
  private def indexProbeVerdict(wmDocs: DataFrame, textCol: String,
                                idCol: String, tsCol: String, table: String,
                                minEstJaccard: Double,
                                windowLen: String): DataFrame =
    skeletonProbeVerdict(wmDocs,
      Seq(indexMatchSkeletons(wmDocs, textCol, idCol, tsCol, table,
        minEstJaccard)), idCol, tsCol, windowLen)

  // The one windowed verdict every cross-run streaming probe rides: each
  // skeleton frame contributes (id, ts) rows — one per verified index
  // match, from any identity (MinHash bands, hamming fingerprints, IVF
  // cells) — counting 1 toward the per-doc tally; the document's full row
  // rides the zero-count payload branch once and is recovered with
  // first(ignoreNulls). Accepting a Seq is what lets curateDocs fuse
  // SEVERAL index identities into a single stateful operator instead of
  // chaining verdicts (which would emit past-watermark rows into each
  // other and be dropped as late).
  private def skeletonProbeVerdict(wmDocs: DataFrame, skeletons: Seq[DataFrame],
                                   idCol: String, tsCol: String,
                                   windowLen: String): DataFrame = {
    val cols = wmDocs.columns.toSeq
    val payload = wmDocs.select(col(idCol), col(tsCol), lit(0L).as("__m"),
      struct(cols.map(col): _*).as("__r"))
    val payloadType = payload.schema("__r").dataType
    skeletons
      .map(_.select(col(idCol), col(tsCol), lit(1L).as("__m"),
        lit(null).cast(payloadType).as("__r")))
      .foldLeft(payload)(_ unionByName _)
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(sum(col("__m")).as("__m"),
        first(col("__r"), ignoreNulls = true).as("__r"))
      .filter(col("__m") === 0)
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  // (id, ts) skeleton per verified index match of a stream document: sign
  // once (the index's own persisted geometry), explode band buckets, join
  // the static band table, verify the est-Jaccard against the id-bucketed
  // signature sibling. Stateless — safe anywhere in a streaming plan.
  private def indexMatchSkeletons(wmDocs: DataFrame, textCol: String,
                                  idCol: String, tsCol: String, table: String,
                                  minEstJaccard: Double): DataFrame = {
    import graft.dedup.Dedup
    val spark = wmDocs.sparkSession
    val sp = spark.table(s"${table}_mhspec").head()
    val (k, numHashes, bands) = (sp.getInt(0), sp.getInt(1), sp.getInt(2))
    wmDocs
      .select(col(idCol), col(tsCol),
        Dedup.minhashSignatureFromText(col(textCol), k, numHashes).as("__sig"))
      .select(col(idCol), col(tsCol), col("__sig"),
        posexplode(Dedup.bandBucketsUdf(bands)(col("__sig")))
          .as(Seq("band", "bucket")))
      .join(spark.table(table)
        .select(col("band"), col("bucket"), col("id").as("__cid")),
        Seq("band", "bucket"))
      .join(spark.table(s"${table}_sigs")
        .select(col("id").as("__cid"), col("sig").as("__csig")), Seq("__cid"))
      .filter(Dedup.sigMatchUdf(col("__sig"), col("__csig")) >= minEstJaccard)
      .select(col(idCol), col(tsCol))
  }

  /** Streaming probe of a persisted HAMMING index
    * ([[graft.dedup.Dedup.writeHammingIndex]]) — the fingerprint-identity
    * member of the streaming cross-run family, next to the MinHash probe
    * ([[dedupeNearAgainstIndex]]): drop every stream document whose 64-bit
    * fingerprint is within the index's Hamming radius of anything the
    * historical corpus registered, where the within-stream perceptual /
    * simhash state ([[graft.multimodal.Multimodal.dedupePerceptualStream]],
    * [[dedupeNear]]) only sees the watermark horizon. `fingerprint` is any
    * 64-bit column expression over the stream row — [[dedupeSimhashAgainstIndex]]
    * passes the SimHash of a text column; the media intake passes its
    * carried one-decode phash — so the fingerprint is never recomputed
    * here. Null fingerprints (undecodable media, null text) carry no
    * evidence and always survive.
    *
    * Shape: the micro-batch is banded under the index's persisted
    * geometry (`<table>_hspec` — pure bit arithmetic, stateless), joined
    * against the static composite-bucketed band table, verified with
    * `bit_count`, and the match skeletons ride a windowed verdict whose
    * payload branch carries the full row at count 0 — the
    * [[dedupeNearAgainstIndex]] discipline verbatim, including its
    * composition constraint: the verdict emits past-watermark rows, so
    * this must END a stateful chain. The index is static to the stream —
    * probed, never stream-mutated; growth stays a batch job
    * ([[graft.dedup.Dedup.appendToHammingIndex]]).
    */
  def dedupeHammingAgainstIndex(docs: DataFrame, fingerprint: org.apache.spark.sql.Column,
                                idCol: String, tsCol: String, table: String,
                                watermark: String = "1 hour",
                                windowLen: String = "5 minutes"): DataFrame =
    hammingProbeVerdict(docs.withWatermark(tsCol, watermark), fingerprint,
      idCol, tsCol, table, windowLen)

  /** Text face of [[dedupeHammingAgainstIndex]]: SimHash the text column
    * and probe — the streaming twin of
    * [[graft.dedup.Dedup.simhashNearDedupAgainstIndex]]'s report-only mode.
    */
  def dedupeSimhashAgainstIndex(docs: DataFrame, textCol: String, idCol: String,
                                tsCol: String, table: String,
                                watermark: String = "1 hour",
                                windowLen: String = "5 minutes"): DataFrame =
    dedupeHammingAgainstIndex(docs,
      when(col(textCol).isNotNull, graft.dedup.Dedup.simhash(col(textCol))),
      idCol, tsCol, table, watermark, windowLen)

  // The hamming twin of [[indexProbeVerdict]] over an ALREADY-watermarked
  // stream — split out so a chain whose upstream stage declared the
  // watermark (the media intake's perceptual state) doesn't redefine it.
  // graft-wide: the media pipeline chains it after its own state stage.
  private[graft] def hammingProbeVerdict(wmDocs: DataFrame,
      fingerprint: org.apache.spark.sql.Column, idCol: String, tsCol: String,
      table: String, windowLen: String): DataFrame =
    skeletonProbeVerdict(wmDocs,
      Seq(hammingMatchSkeletons(wmDocs, fingerprint, idCol, tsCol, table)),
      idCol, tsCol, windowLen)

  // (id, ts) skeleton per verified hamming-index match: band the stream
  // row's fingerprint under the index's persisted geometry (pure bit
  // arithmetic), join the static composite-bucketed band table, verify
  // with bit_count. Stateless — safe anywhere in a streaming plan.
  private def hammingMatchSkeletons(wmDocs: DataFrame,
      fingerprint: org.apache.spark.sql.Column, idCol: String, tsCol: String,
      table: String): DataFrame = {
    import graft.dedup.Dedup
    val spark = wmDocs.sparkSession
    val maxHamming = spark.table(s"${table}_hspec").head().getInt(0)
    wmDocs
      .select(col(idCol), col(tsCol), fingerprint.as("__h"))
      .where(col("__h").isNotNull)
      .select(col(idCol), col(tsCol), col("__h"),
        explode(Dedup.hammingBandStructs(col("__h"), maxHamming)).as("bb"))
      .select(col(idCol), col(tsCol), col("__h"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .join(spark.table(table).select(col("band"), col("bucket"),
        col("h").as("__ih")), Seq("band", "bucket"))
      .filter(expr("bit_count(__h ^ __ih)") <= maxHamming)
      .select(col(idCol), col(tsCol))
  }

  /** Streaming probe of a persisted IVF index
    * ([[graft.similarity.Similarity.writeIvfIndex]]) — the EMBEDDING-identity
    * member of the streaming cross-run family, completing the matrix next
    * to exact hashes ([[dedupeExact]] state), MinHash bands
    * ([[dedupeNearAgainstIndex]]) and hamming fingerprints
    * ([[dedupeHammingAgainstIndex]]): drop every stream document whose
    * embedding has cosine ≥ `threshold` against anything in the indexed
    * historical corpus — paraphrased replays that share no n-gram or
    * fingerprint bits with the original, which only the semantic identity
    * catches. The streaming twin of
    * [[graft.dedup.Dedup.semanticDedupAgainstIndex]]'s report-only mode.
    *
    * Shape: centroids are read ONCE batch-side at stream start (the
    * benchmark-Bloom convention) and ride a codegen'd
    * [[graft.functions.NearestCentroid]] row-local assignment; the
    * micro-batch joins ONLY its assigned cells of the static
    * cell-partitioned index (stream-static equi-join on `cell` — the same
    * partition-pruned read the batch probe does), cosine-verifies, and the
    * match skeletons ride the shared windowed verdict
    * ([[dedupeNearAgainstIndex]]'s discipline verbatim, including its
    * composition constraint: the verdict emits past-watermark rows, so
    * this must END a stateful chain). Null embeddings carry no evidence
    * and always survive. The index is static to the stream — probed,
    * never stream-mutated; growth stays a batch job
    * ([[graft.similarity.Similarity.appendToIvfIndex]]).
    */
  def dedupeSemanticAgainstIndex(docs: DataFrame, vecCol: String, idCol: String,
                                 tsCol: String, table: String,
                                 threshold: Double = 0.9,
                                 watermark: String = "1 hour",
                                 windowLen: String = "5 minutes"): DataFrame = {
    val wm = docs.withWatermark(tsCol, watermark)
    skeletonProbeVerdict(wm,
      Seq(semanticMatchSkeletons(wm, vecCol, idCol, tsCol, table, threshold)),
      idCol, tsCol, windowLen)
  }

  // (id, ts) skeleton per cosine-verified IVF-index match. The index
  // table's vector column must be named `vecCol` (the writeIvfIndex
  // convention the batch probe shares). Stateless.
  private def semanticMatchSkeletons(wmDocs: DataFrame, vecCol: String,
                                     idCol: String, tsCol: String,
                                     table: String,
                                     threshold: Double): DataFrame = {
    import graft.similarity.Similarity
    val spark = wmDocs.sparkSession
    val centroids = Similarity.readIvfCentroids(spark, table)
    val probes = wmDocs
      .select(col(idCol), col(tsCol), col(vecCol).as("__v"))
      .where(col("__v").isNotNull)
    Similarity.assignToCentroids(probes, "__v", centroids,
        centroids.head._2.length)
      .withColumn("__bn", sqrt(Similarity.dot(col("__v"), col("__v"))))
      .join(spark.table(table).select(col("cell"), col(vecCol).as("__iv")),
        Seq("cell"))
      .filter(Similarity.dot(col("__v"), col("__iv")) /
        (col("__bn") * sqrt(Similarity.dot(col("__iv"), col("__iv")))) >= threshold)
      .select(col(idCol), col(tsCol))
  }

  /** Streaming corpus intake: the curation stages that are row-local run
    * stateless on the document stream — fused langQuality gate, benchmark
    * decontamination, PII redaction, md5 split assignment — and exact
    * dedup is the one stateful stage, reusing [[dedupeExact]]'s
    * hash-within-watermark shape. The incremental twin of
    * [[graft.pipeline.CorpusPipeline.curate]]'s exact-only configuration
    * with `redactPii = true`; near-dedup and span-level dedup stay batch
    * compactions (a candidate join over the whole corpus and a
    * corpus-first-occurrence rule are both non-incremental by nature).
    *
    * Decontamination (when `benchmark` is given) is a Bloom filter of the
    * benchmark's distinct gram hashes ([[graft.dedup.Dedup.benchmarkBloom]]),
    * built ONCE batch-side at stream start and broadcast — in the stream it
    * is a stateless map-side filter (shingle, test membership, early-exit at
    * `maxContamination` hits), so the stage adds zero streaming state and no
    * shuffle. Unlike the batch Bloom path there is no exact-verify join to
    * kill false positives: a clean g-gram document is over-dropped with
    * probability ≲ g·fpp, which is why `contaminationFpp` defaults 100×
    * tighter than the batch escape hatch's.
    *
    * Stage order is part of the contract: decontamination runs before the
    * stateful dedup (same survivor set either way — both drop rows
    * independently — but dropping contaminated docs first keeps their
    * hashes out of the dedup state store), the split hash is taken on the
    * RAW text (so batch and streaming ingestion of the same document land
    * in the same split) and redaction runs last, before the sink.
    *
    * `nearDedupIdCol` upgrades the dedup stage from exact
    * ([[dedupeExact]]) to BANDED near-dedup ([[dedupeNearBanded]], which
    * subsumes exact: identical docs share every band) — the streaming
    * twin of batch curate()'s MinHash stage. It inherits that operator's
    * contracts: verdicts emit when the watermark passes the document's
    * window (bounded latency, not immediate) and the session needs
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=
    * false` (see [[dedupeNearBanded]]'s scaladoc for why the conservative
    * check does not apply to this shape).
    *
    * `nearIndexTable` adds the CROSS-RUN stage — the incremental twin of
    * batch curate()'s `nearIndexTable`: each micro-batch is probed
    * against the persisted (static, never stream-mutated) MinHash band
    * index ([[dedupeNearAgainstIndex]]), so replays of the HISTORICAL
    * corpus are dropped, where the within-stream dedup state only sees
    * the watermark horizon. The probe's windowed verdict emits
    * past-watermark rows, so it must END the stateful chain (see
    * [[dedupeNearAgainstIndex]]): on the exact path it runs AFTER
    * [[dedupeExact]] (replayed docs therefore DO register their hash in
    * the dedup state until the watermark expires it — the price of the
    * ordering constraint), keyed by `nearIndexIdCol` (required there);
    * on the banded path it FUSES into [[dedupeNearBanded]]'s own verdict
    * aggregation, which is keyed by `nearDedupIdCol` and windowed by the
    * single fused verdict's `nearIndexWindowLen` — a different
    * `nearIndexIdCol` is rejected rather than silently ignored. Probing
    * always keys on the raw text (before redaction). Index growth stays
    * a batch job ([[graft.dedup.Dedup.appendToMinhashIndex]]).
    *
    * `semanticIndexTable` (+ `embCol`) adds the EMBEDDING identity to the
    * cross-run stage — the incremental twin of batch curate()'s semantic
    * tier: each micro-batch's embeddings are probed against a persisted
    * IVF index ([[dedupeSemanticAgainstIndex]]'s skeletons), so
    * paraphrased replays of the historical corpus drop too. On the
    * exact-dedup path the semantic skeletons FUSE into the same single
    * windowed verdict as the MinHash probe (one stateful operator,
    * whichever subset of identities is configured, keyed by
    * `nearIndexIdCol`); on the banded path it is rejected loudly —
    * chain [[dedupeSemanticAgainstIndex]] as its own downstream stage
    * instead.
    */
  def curateDocs(docs: DataFrame, textCol: String, tsCol: String,
                 langs: Set[String], minQuality: Double,
                 trainPct: Int = 90, valPct: Int = 5,
                 watermark: String = "1 hour",
                 benchmark: Option[DataFrame] = None,
                 contaminationNgram: Int = 8,
                 maxContamination: Long = 1,
                 contaminationFpp: Double = 1e-4,
                 nearDedupIdCol: Option[String] = None,
                 nearIndexTable: Option[String] = None,
                 nearIndexIdCol: Option[String] = None,
                 nearIndexJaccard: Double = 0.7,
                 nearIndexWindowLen: String = "5 minutes",
                 semanticIndexTable: Option[String] = None,
                 embCol: Option[String] = None,
                 semanticThreshold: Double = 0.9,
                 qualityModel: Option[graft.text.Classifier.LinearModel] = None,
                 minModelScore: Double = 0.5,
                 lmModel: Option[graft.text.LangModel.ServedBigramLm] = None,
                 maxCrossEntropy: Double = Double.PositiveInfinity,
                 knModel: Option[graft.text.LangModel.ServedKnLm] = None,
                 maxKnCrossEntropy: Double = Double.PositiveInfinity,
                 dropRepeatedLines: Boolean = false,
                 maxBulletFrac: Double = 1.0,
                 maxEllipsisFrac: Double = 1.0,
                 blockedDomains: Seq[String] = Nil,
                 urlCol: String = "url",
                 blockedWords: Seq[String] = Nil,
                 blockedPhrases: Seq[String] = Nil): DataFrame = {
    import graft.text.TextOps
    import graft.dedup.Dedup
    // batch curate()'s crawl-cleanup stages, stream-safe because they are
    // row-local: line cleanup FIRST (dedup state keys on cleaned text —
    // a footer-padded refetch still drops), then the Gopher line caps
    val lineCleaned =
      if (!dropRepeatedLines) docs
      else docs.withColumn(textCol, TextOps.dropRepeatedLines(col(textCol)))
    val lineGated =
      if (maxBulletFrac >= 1.0 && maxEllipsisFrac >= 1.0) lineCleaned
      else {
        val ls = TextOps.lineStats(col(textCol))
        lineCleaned.filter(
          (ls.getField("frac_bullet").isNull ||
            ls.getField("frac_bullet") <= maxBulletFrac) &&
            (ls.getField("frac_ellipsis").isNull ||
              ls.getField("frac_ellipsis") <= maxEllipsisFrac))
      }
    // blocklist gates, all row-local on in-config lists (the join-shaped
    // domain filter would be a stream self-join): the literal-array
    // suffix test, the word intersect, the phrase automaton
    val blockGated = {
      val d = if (blockedDomains.isEmpty) lineGated
        else lineGated.filter(!TextOps.blockedDomainHit(urlCol, blockedDomains))
      val w = if (blockedWords.isEmpty) d
        else d.filter(TextOps.blockedWordCount(col(textCol), blockedWords) === 0)
      if (blockedPhrases.isEmpty) w
      else w.filter(
        graft.text.Phrases.phraseHitCount(col(textCol), blockedPhrases) === 0)
    }
    val heuristicGated = blockGated
      .withColumn("__lq", TextOps.langQuality(col(textCol)))
      .filter(col("__lq._1").isin(langs.toSeq: _*) && col("__lq._2") >= minQuality)
      .withColumn("lang", col("__lq._1"))
      .withColumn("quality", col("__lq._2"))
      .drop("__lq")
      .withColumn("split", TextOps.splitAssign(col(textCol), trainPct, valPct))
    // model-based gates (the batch curate()'s stage-1 twins): row-local
    // broadcast passes, stateless — stream-safe by construction
    val classifierGated = qualityModel match {
      case None => heuristicGated
      case Some(m) => heuristicGated.filter(
        graft.text.Classifier.score(docs.sparkSession, m, col(textCol)) >= minModelScore)
    }
    val biGated = lmModel match {
      case None => classifierGated
      case Some(lm) =>
        val ce = graft.text.LangModel.scoreColumn(docs.sparkSession, lm, col(textCol))
        classifierGated.filter(ce.isNull || ce <= maxCrossEntropy)
    }
    val gated = knModel match {
      case None => biGated
      case Some(kn) =>
        val ce = graft.text.LangModel.scoreKnColumn(docs.sparkSession, kn, col(textCol))
        biGated.filter(ce.isNull || ce <= maxKnCrossEntropy)
    }
    val decontaminated = benchmark match {
      case None => gated
      case Some(b) =>
        val bf = Dedup.benchmarkBloom(b, textCol, contaminationNgram, contaminationFpp)
        val bcBf = docs.sparkSession.sparkContext.broadcast(bf)
        val n = contaminationNgram
        // floor at 1: the batch path's `n_shared >= maxContamination` drop
        // can only ever see docs with >= 1 shared gram, so 0 behaves as 1
        // there — without the floor the stream's `shared < bound` test
        // would be vacuously false and drop every document
        val bound = math.max(maxContamination, 1L)
        val clean = udf { (s: String) =>
          val grams = Dedup.ngramHashSetOf(s, n)
          var shared = 0L
          var i = 0
          while (i < grams.length && shared < bound) {
            if (bcBf.value.mightContainLong(grams(i))) shared += 1
            i += 1
          }
          shared < bound
        }
        gated.filter(clean(col(textCol)))
    }
    // the cross-run index probe's windowed verdict emits past-watermark
    // rows, so it must terminate the stateful chain: the exact path runs
    // it AFTER dropDuplicates (which emits in the arrival batch); the
    // banded path fuses it into its own verdict aggregation
    val deduped = (nearDedupIdCol, nearIndexTable) match {
      case (None, None) if semanticIndexTable.isEmpty =>
        dedupeExact(decontaminated, textCol, tsCol, watermark)
      case (None, idxOpt) =>
        val id = nearIndexIdCol.getOrElse(throw new IllegalArgumentException(
          "an index probe requires nearIndexIdCol on the exact-dedup path"))
        // dedupeExact declared the watermark; the probes must not redefine
        // it. Every configured index identity contributes a stateless
        // skeleton branch into ONE fused windowed verdict — chaining
        // per-identity verdicts would emit past-watermark rows into each
        // other and drop them as late.
        val exact = dedupeExact(decontaminated, textCol, tsCol, watermark)
        val skeletons =
          idxOpt.toSeq.map(t => indexMatchSkeletons(exact, textCol, id,
            tsCol, t, nearIndexJaccard)) ++
          semanticIndexTable.toSeq.map { t =>
            val ec = embCol.getOrElse(throw new IllegalArgumentException(
              "semanticIndexTable requires embCol: the stream rows must " +
                "carry the embedding to probe with"))
            semanticMatchSkeletons(exact, ec, id, tsCol, t, semanticThreshold)
          }
        skeletonProbeVerdict(exact, skeletons, id, tsCol, nearIndexWindowLen)
      case (Some(id), idx) =>
        // the banded path's fused verdict lives inside dedupeNearBanded;
        // a semantic branch is not wired there — reject loudly rather
        // than silently skip the configured probe
        require(semanticIndexTable.isEmpty,
          "semanticIndexTable is not supported with nearDedupIdCol (banded " +
            "path): run dedupeSemanticAgainstIndex as its own stage or use " +
            "the exact-dedup path")
        // the fused verdict can only key on the banded id column — a
        // conflicting probe id would silently change drop semantics
        require(nearIndexIdCol.forall(_ == id),
          s"nearIndexIdCol=${nearIndexIdCol.get} conflicts with " +
            s"nearDedupIdCol=$id: the fused banded+index verdict keys on one id")
        val fusedWindow =
          if (idx.isDefined) nearIndexWindowLen else "5 minutes"
        dedupeNearBanded(decontaminated, textCol, id, tsCol, watermark,
          windowLen = fusedWindow,
          indexTable = idx, minEstJaccard = nearIndexJaccard)
    }
    deduped.withColumn(textCol, TextOps.redactPii(col(textCol)))
  }

  /** Watermarked STREAM-STREAM interval join — correlate two live event
    * streams (impression ↔ click, request ↔ response, probe ↔ ack) where
    * the right event must land in `[left.ts, left.ts + within]` on the
    * shared `keyCol`. Both sides declare watermarks and the join carries
    * the explicit time-range predicate — the two things Spark needs to
    * bound the buffered state: each side's rows expire once the other
    * side's watermark passes their join window, so state is
    * O(rate × (watermark + within)), never unbounded. `joinType`
    * `"inner"` emits matches as they arrive; `"left_outer"` additionally
    * emits left rows with null right columns once the watermark proves no
    * match can still arrive (the ad-attribution / timeout-detection
    * shape).
    *
    * Column contract: both frames share `keyCol`; every other column name
    * must be distinct across the two sides (rejected loudly otherwise —
    * an ambiguous output column would silently shadow). The result carries
    * the key once, then left columns, then right columns.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   within: String = "10 minutes",
                   watermark: String = "1 hour",
                   joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType), s"joinType=$joinType")
    val dup = (left.columns.toSet - keyCol).intersect(right.columns.toSet - keyCol)
    require(dup.isEmpty,
      s"non-key columns shared by both sides would be ambiguous: $dup")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val cond = col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"interval $within")
    val rightCols = right.columns.filterNot(_ == keyCol)
    l.join(r, cond, joinType)
      .select(col(s"l.$keyCol").as(keyCol) +:
        (left.columns.filterNot(_ == keyCol).map(c => col(s"l.$c")) ++
          rightCols.map(c => col(s"r.$c"))): _*)
  }

  /** Streaming probe of the LINE-hash registry — the incremental face of
    * [[graft.dedup.Dedup.dedupLinesAgainstRegistry]]'s report-only mode,
    * completing the cross-run matrix for line identity: nav menus /
    * cookie banners / license blocks registered by EARLIER batch runs
    * strip from streamed pages as they arrive. Per document: lines cut,
    * registered non-blank lines dropped (stream-static anti-join on the
    * hash-bucketed registry — the registry is static to the stream;
    * growth stays the batch append's job), then one windowed
    * reassembly (the L16 verdict-agg shape) rebuilds
    * (idCol, n_kept, dedup_text) with blanks preserved as structure and
    * WITHIN-document duplicate lines collapsed to their first position
    * row-locally in the collected array (no second stateful stage).
    *
    * Scope, honestly: the batch pass also elects a CORPUS-first winner
    * across documents in the same run; a stream cannot see the batch's
    * whole corpus, so cross-document within-stream election is out of
    * scope here (run the batch op on the day's corpus for that) — on
    * corpora whose only cross-doc shared lines are registered ones, the
    * streamed output row-equals the batch report (spec-pinned).
    *
    * Emits on watermark close. Documents whose every content line was
    * registered vanish, as in batch.
    */
  /** Streaming heavy hitters — the trend-detection face of
    * [[graft.operators.HeavyHitters]]: each micro-batch reports ITS OWN
    * exact keys above `fracPpm` of the batch ("what token/URL/host is
    * suddenly hot in this ingest window"), via foreachBatch → the batch
    * operator — the bm25ServeStream pattern, because the two-pass
    * MG-then-recount shape needs a static frame per batch. Per-batch
    * semantics are the POINT here (a trend is a within-window
    * statement); corpus-lifetime frequency is the batch operator's job
    * over the accumulated table. Each report row carries the batch id
    * for downstream correlation.
    */
  def heavyHittersStream(keys: DataFrame, keyCol: String, fracPpm: Long)
                        (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // releasable variant + eager materialization: a per-batch caller
          // in a long-lived driver must not leak the operator's internal
          // persisted MG summary (Containment's localCheckpoint(true) +
          // release discipline — blocks freed before the next batch).
          val (hh, release) = graft.operators.HeavyHitters
            .heavyHittersReleasable(batch, keyCol, fracPpm)
          try sink(hh.withColumn("batch_id", lit(batchId)).localCheckpoint(true))
          finally release()
        }
      }
      .start()

  /** Grouped [[heavyHittersStream]] — each micro-batch reports its own
    * exact per-GROUP heavy hitters ("which token is suddenly hot in THIS
    * window, per language"), via foreachBatch → the grouped batch
    * operator. Same per-batch trend semantics; corpus-lifetime per-group
    * frequency is the grouped cross-run registry's job
    * ([[graft.operators.HeavyHitters.heavyHittersOverRunsByGroup]]).
    */
  def heavyHittersByGroupStream(pairs: DataFrame, groupCol: String,
                                keyCol: String, fracPpm: Long)
                               (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // releasable + eager: the per-batch persisted grouped-MG summary
          // must not accumulate in a long-lived driver (the global twin's
          // r13-advice discipline)
          val (hh, release) = graft.operators.HeavyHitters
            .heavyHittersByGroupReleasable(batch, groupCol, keyCol, fracPpm)
          try sink(hh.withColumn("batch_id", lit(batchId)).localCheckpoint(true))
          finally release()
        }
      }
      .start()

  /** Streaming CARDINALITY probe — the live face of the portable sketch
    * registry ([[graft.operators.Cardinality]]): each micro-batch reports,
    * per group, the registry's distinct estimate AS IF the batch were
    * appended (`n_distinct_est`) and the NOVELTY that implies
    * (`novelty_est` = with-batch − registry-only, clamped at 0 — how many
    * never-seen distincts this ingest window brings), WITHOUT touching
    * the registry. The batch sketch is built by the same factored
    * `portableSketchOf` as a real append, so the probe can never disagree
    * with what a subsequent batch append will register. foreachBatch →
    * the batch core (the heavyHittersStream pattern); probe-only like
    * every streaming registry twin — appends stay the batch pass's job.
    * Estimates are estimates (exact below the sparse cap, raw-HLL-bounded
    * above): novelty is a TREND signal, never an exact gate.
    */
  def cardinalityProbeStream(values: DataFrame, groupCol: String,
                             valueCol: String, table: String)
                            (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    values.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val withB = graft.operators.Cardinality
            .distinctPerGroupPortableWithBatch(batch, groupCol, valueCol,
              table)
          val base = graft.operators.Cardinality
            .distinctPerGroupPortable(spark, table)
            .withColumnRenamed("n_distinct_est", "__base")
          val report = withB.join(base, Seq("group"), "left")
            .select(col("group"), col("n_distinct_est"),
              greatest(col("n_distinct_est") - coalesce(col("__base"), lit(0L)),
                lit(0L)).as("novelty_est"),
              lit(batchId).as("batch_id"))
          sink(report.localCheckpoint(true))
        }
      }
      .start()

  /** Streaming DISTRIBUTION-drift probe — the live face of
    * [[graft.operators.Histograms.driftReport]]: each micro-batch's
    * per-group dyadic histogram is compared against the persisted
    * baseline registry and reported as (group, psi, l1, batch_id) —
    * "does this ingest window's length/score distribution still look
    * like everything before it", the alarm a pipeline owner wants
    * DURING a crawl, not after. foreachBatch → the batch core (the
    * heavyHittersStream pattern — drift needs the batch's whole
    * histogram, a static-frame computation), binning shared with the
    * batch append ([[graft.operators.Histograms]]' histogramOf) so the
    * two can never bin differently. Per-batch semantics are the point:
    * each window is judged against the REGISTRY baseline, not against
    * other windows. Probe-only, like every streaming registry twin:
    * baseline appends stay the batch pass's job (the delta-file failure
    * contract needs a batch write — and at-least-once foreachBatch
    * retries would double-append counts, which probes are immune to).
    */
  def distributionDriftStream(values: DataFrame, groupCol: String,
                              valueCol: String, baselineTable: String,
                              roundTo: Int = 4)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    values.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val report = graft.operators.Histograms.driftBetween(
            graft.operators.Histograms.histogramOf(batch, groupCol, valueCol),
            spark.table(baselineTable), roundTo)
          sink(report.withColumn("batch_id", lit(batchId))
            .localCheckpoint(true))
        }
      }
      .start()

  /** Streaming FREQUENCY-ESTIMATE probe — the live face of
    * [[graft.operators.CountMin.cmsEstimates]]: each micro-batch's
    * distinct (group, key) pairs are estimated against the persisted
    * Count–Min registry and reported as (group, key, cnt_est, batch_id)
    * — "roughly how often has everything arriving in this window been
    * seen before", the signal a crawl scheduler reads to deprioritize
    * already-hammered URLs DURING the crawl. foreachBatch → the batch
    * core (the heavyHittersStream pattern); the probe addresses cells
    * through the same [[graft.operators.KeyHash]] derivation an append
    * uses, so probe and append can never hash apart. Probe-only, like
    * every streaming registry twin: appends stay the batch pass's job
    * (at-least-once foreachBatch retries would double-add counts — a
    * probe is immune).
    */
  def cmsProbeStream(keys: DataFrame, groupCol: String, keyCol: String,
                     table: String, depth: Int = 4, width: Int = 1024)
                    (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val probes = batch
            .select(col(groupCol).cast("string").as(groupCol),
              col(keyCol).cast("string").as(keyCol))
            .distinct()
          val report = graft.operators.CountMin.cmsEstimates(
            probes, groupCol, keyCol, table, depth, width)
          sink(report.withColumn("batch_id", lit(batchId))
            .localCheckpoint(true))
        }
      }
      .start()

  /** Streaming MEMBERSHIP probe — the live face of
    * [[graft.operators.BloomReg.mightContain]]: each micro-batch's
    * distinct (group, key) pairs are probed against the persisted Bloom
    * registry and reported as (group, key, might_contain, batch_id).
    * might_contain = 0 is DEFINITIVE (no false negatives), which is the
    * point: it is the cheap admission gate in front of an exact
    * registry — "definitely new" items skip the exact probe entirely,
    * and only the "maybe" remainder pays the d12-family lookup.
    * Probe-only, like every streaming registry twin.
    */
  def bloomProbeStream(keys: DataFrame, groupCol: String, keyCol: String,
                       table: String, mBits: Int = 65536, kProbes: Int = 4)
                      (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val probes = batch
            .select(col(groupCol).cast("string").as(groupCol),
              col(keyCol).cast("string").as(keyCol))
            .distinct()
          val report = graft.operators.BloomReg.mightContain(
            probes, groupCol, keyCol, table, mBits, kProbes)
          sink(report.withColumn("batch_id", lit(batchId))
            .localCheckpoint(true))
        }
      }
      .start()

  /** Streaming tokenizer-coverage probe — the live face of the t51 OOV
    * report: each micro-batch of documents is Viterbi-encoded under the
    * PERSISTED unigram vocabulary ([[graft.text.Unigram.loadModel]],
    * loaded once at stream start — the tokenizer is a pinned artifact,
    * not something a stream retrains) and scored per group as
    * (group, n_pieces, n_unk, oov_ppm, batch_id) through the SAME
    * factored [[graft.text.Unigram.oovReport]] as the batch query, so
    * the two can never diverge. The operational alarm: a rising oov_ppm
    * on a live crawl means the intake is drifting outside the trained
    * alphabet NOW, before the next training run pays for it. Probe-only,
    * like every streaming registry twin (at-least-once foreachBatch
    * retries would corrupt any state this wrote; probes are immune).
    */
  def oovProbeStream(docs: DataFrame, groupCol: String, textCol: String,
                     modelTable: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    val model = graft.text.Unigram.loadModel(spark, modelTable)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val report = graft.text.Unigram.oovReport(
            spark, batch, textCol, groupCol, model)
          sink(report.withColumn("batch_id", lit(batchId))
            .localCheckpoint(true))
        }
      }
      .start()
  }

  /** Streaming CHUNK-registry probe — the binary member of the
    * registry-probe matrix (exact L16f, MinHash L16g, hamming L16h,
    * lines above): blobs arriving on a stream report how many chunk
    * BYTES each actually adds over the persisted
    * [[graft.dedup.Cdc]] chunk registry. Chunking is row-local (the
    * blob's bytes never leave its task); the registry lookup is one
    * stateless stream-static LEFT join keyed on the 8-byte chunk hash
    * (an anti-join would also drop the all-seen blobs a storage report
    * must still show at zero); the per-blob reassembly is one windowed
    * aggregate emitting on watermark close.
    *
    * Probe-only, like every streaming registry twin: appends stay the
    * batch pass's job (the delta-file failure contract needs a batch
    * write). Cross-blob WITHIN-STREAM winner election also stays the
    * batch pass's job — a chunk shared by two stream blobs but absent
    * from the registry counts in BOTH reports here; when stream blobs
    * share chunks only with the registry, the streamed report
    * row-equals `newChunksAgainstRegistry(update = false)`
    * (spec-pinned, the lines twin's exact contract).
    */
  def newChunksAgainstRegistryStream(blobs: DataFrame, binCol: String,
                                     idCol: String, tsCol: String,
                                     registryTable: String,
                                     minSize: Int = 2048, avgBits: Int = 13,
                                     maxSize: Int = 65536,
                                     watermark: String = "10 minutes",
                                     windowLen: String = "10 minutes"): DataFrame = {
    val spark = blobs.sparkSession
    val chunksU = udf { (b: Array[Byte]) =>
      graft.dedup.Cdc.chunkBlob(b, minSize, avgBits, maxSize)
        .groupBy(_._3).map { case (h, cs) => (h, cs.map(_._2).min) }.toArray
    }
    val exploded = blobs.withWatermark(tsCol, watermark)
      .withColumn("__chs", chunksU(col(binCol)))
      .filter(size(col("__chs")) > 0) // empty/null blobs vanish, as in batch
      .select(col(idCol).as("id"), col(tsCol).as("__ts"),
        size(col("__chs")).cast("long").as("n_chunks"),
        explode(col("__chs")).as("__c"))
      .select(col("id"), col("__ts"), col("n_chunks"),
        col("__c._1").as("chunk_hash"), col("__c._2").as("clen"))
    val probed = exploded.join(
      spark.table(registryTable)
        .select(col("chunk_hash"), lit(1).as("__reg")),
      Seq("chunk_hash"), "left")
    probed
      .groupBy(window(col("__ts"), windowLen), col("id"), col("n_chunks"))
      .agg(
        sum(when(col("__reg").isNull, 1L).otherwise(0L)).as("n_new_chunks"),
        sum(when(col("__reg").isNull, col("clen").cast("long"))
          .otherwise(0L)).as("new_bytes"))
      .select(col("id"), col("n_chunks"), col("n_new_chunks"), col("new_bytes"))
  }

  def stripLinesAgainstRegistry(docs: DataFrame, textCol: String,
                                idCol: String, tsCol: String,
                                registryTable: String,
                                watermark: String = "10 minutes",
                                windowLen: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    val lines = docs.withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val isBlank = trim(col("line")) === ""
    val kept = lines.filter(!isBlank)
      .withColumn("line_hash", md5(col("line").cast("binary")))
      .join(spark.table(registryTable), Seq("line_hash"), "left_anti")
      .drop("line_hash")
      .unionByName(lines.filter(isBlank))
    kept
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("line"))))
        .as("__ls"))
      // within-doc collapse, row-local: keep a non-blank line only at its
      // first position (blanks always); filter's second lambda arg is the
      // 0-based index, slice(…, 1, i) is everything before it
      .withColumn("__kept", filter(col("__ls"), (x, i) =>
        trim(x.getField("line")) === "" ||
          !exists(slice(col("__ls"), lit(1), i), y =>
            y.getField("line") === x.getField("line") &&
              trim(y.getField("line")) =!= "")))
      .select(col(idCol),
        size(filter(col("__kept"), x => trim(x.getField("line")) =!= ""))
          .cast("long").as("n_kept"),
        array_join(transform(col("__kept"), x => x.getField("line")), "\n")
          .as("dedup_text"))
      .filter(col("n_kept") >= 1)
  }

  /** Streaming per-source admission quota — the incremental face of
    * [[graft.text.TextOps.sourceQuota]]'s domain cap: admit at most
    * `maxPerSource` rows per source over the life of the query, so one
    * hot domain cannot dominate an intake stream. Admission is
    * earliest-batch-first (a stream cannot see future arrivals), with a
    * deterministic `idCol` order inside each micro-batch; once a source's
    * quota is spent, later arrivals drop.
    *
    * State is ONE long (the admitted count) per source with no timeout —
    * bounded by the distinct-source cardinality, which for domain caps is
    * orders of magnitude below document cardinality; for a per-day quota,
    * run a daily query (the batch op is the replayable form).
    */
  def quotaPerSource(df: DataFrame, sourceCol: String, idCol: String,
                     maxPerSource: Int): DataFrame = {
    require(maxPerSource > 0, s"maxPerSource=$maxPerSource")
    val schema = df.schema
    val rowEnc = org.apache.spark.sql.Encoders.row(schema)
    val srcIdx = schema.fieldIndex(sourceCol)
    val idIdx = schema.fieldIndex(idCol)
    val idOf: org.apache.spark.sql.Row => Long = schema(idIdx).dataType match {
      case org.apache.spark.sql.types.LongType => _.getLong(idIdx)
      case org.apache.spark.sql.types.IntegerType => _.getInt(idIdx).toLong
      case other => throw new IllegalArgumentException(
        s"idCol $idCol must be integral for deterministic admission, got $other")
    }
    df.as(rowEnc)
      .groupByKey(_.getString(srcIdx))(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[Long, org.apache.spark.sql.Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[org.apache.spark.sql.Row], state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          val room = maxPerSource - used
          if (room <= 0) Iterator.empty
          else {
            val admit = rows.toSeq.sortBy(idOf).take(room.toInt)
            state.update(used + admit.size)
            admit.iterator
          }
      }(org.apache.spark.sql.Encoders.scalaLong, rowEnc)
  }

  /** Flush the still-open session per user (batch-style finalization used
    * in tests and backfills).
    */
  def openSessions(events: Dataset[Event], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).mapGroups { (userId, rows) =>
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var sessionId = 1L
      var start = sorted.head.ts.getTime
      var last = start
      var count = 0L
      for (e <- sorted) {
        val t = e.ts.getTime
        if (count > 0 && t - last > gapSec * 1000) {
          sessionId += 1; start = t; count = 0
        }
        last = t; count += 1
      }
      Session(userId, sessionId, count, new Timestamp(start), new Timestamp(last))
    }
  }
}
