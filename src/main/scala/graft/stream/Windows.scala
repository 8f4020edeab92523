package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-time streaming operators over the change/event stream —
 * capabilities the reference lacks outright (SURVEY §2.8: DataX has no
 * watermarks or event-time windows; its only "window" is the tsdbreader
 * hour split), expressed with the standard Structured Streaming
 * machinery so state stores, watermarking and recovery come from Spark:
 *
 *  - [[windowedCounts]]: tumbling event-time window aggregation with a
 *    watermark bounding state;
 *  - [[sessionize]]: gap-based sessions via
 *    `flatMapGroupsWithState` + event-time timeout — the custom-state
 *    path for semantics `window()` can't express.
 *
 * Scale notes: both are keyed-state operators whose state is sharded by
 * the grouping key across executors (HDFSBackedStateStore /RocksDB at
 * scale); the watermark is what keeps state finite at 100 TB — without
 * it the sessionizer would accumulate every key forever.
 */
object Windows {

  /** Tumbling event-time counts per (window, event_type) with a
    * watermark: late events beyond `watermarkDelay` are dropped and
    * window state older than the watermark is evicted. */
  def windowedCounts(events: DataFrame, watermarkDelay: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

  final case class SessionState(
      startMs: Long, lastMs: Long, nEvents: Long)

  final case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization: a session closes when no event arrives
    * for `gapMs` (by event time, enforced via the watermark-driven
    * timeout). Emits one row per CLOSED session. */
  def sessionize(events: Dataset[SessionEvent], watermarkDelay: String, gapMs: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the session gap: close and emit
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // a late-but-within-watermark event may PRECEDE the
                  // tracked session: extend the start backwards too
                  cur = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t), nEvents = s.nEvents + 1))
                case Some(s) => // gap exceeded within the batch: close, start anew
                  closed ::= Session(userId, new java.sql.Timestamp(s.startMs),
                    new java.sql.Timestamp(s.lastMs), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time out once the watermark passes last-event + gap
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
