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
            // interval merge: the tracked session and every event become
            // [start, end] intervals; sorted by start, adjacent intervals
            // within gapMs fuse. This handles late-but-within-watermark
            // events that PRECEDE the tracked session correctly: within
            // gapMs of its start they extend it backwards, farther back
            // they form their own session instead of being glued across
            // a silence longer than the gap.
            val items =
              (state.getOption.map(s => SessionState(s.startMs, s.lastMs, s.nEvents)).toList ++
                batch.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)).toList)
                .sortBy(s => (s.startMs, s.lastMs))
            if (items.isEmpty) Iterator.empty else {
            val merged = items.foldLeft(List.empty[SessionState]) {
              case (h :: tail, i) if i.startMs - h.lastMs <= gapMs =>
                SessionState(h.startMs, math.max(h.lastMs, i.lastMs), h.nEvents + i.nEvents) :: tail
              case (acc, i) => i :: acc
            }.reverse
            // latest interval stays open in state; all earlier ones are
            // separated from it by > gapMs and close now (an even-later
            // straggler for one of them would start a fresh session —
            // bounded by the watermark, same as any append-mode sink)
            val open = merged.last
            state.update(open)
            state.setTimeoutTimestamp(open.lastMs + gapMs)
            merged.init.map(s => Session(userId, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.nEvents)).iterator
            }
          }
      }
  }
}
