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
    * more than `gapSec` past its last event, emitting one Session row —
    * the streaming twin of e02_sessionize.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st == null) st = SessionState(1L, t, t, 1L)
            else if (t - st.lastMs > gapSec * 1000) {
              closed += Session(userId, st.sessionId, st.count,
                new Timestamp(st.startMs), new Timestamp(st.lastMs))
              st = SessionState(st.sessionId + 1, t, t, 1L)
            } else st = st.copy(lastMs = t, count = st.count + 1)
          }
          if (st != null) state.update(st)
          closed.iterator
      }
  }

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
