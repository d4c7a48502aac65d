package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the Structured Streaming twin of the batch
  * q13 sessionizer (`Relational.scala`), over the same `events` schema
  * (`user_id`, `event_id`, `ts` as epoch nanoseconds).
  *
  * Two implementations, deliberately:
  *   - [[sessions]] uses the built-in `session_window` aggregation —
  *     fully declarative, works identically on a batch DataFrame and a
  *     `readStream` source, state is managed by Spark's streaming
  *     aggregation operator (RocksDB/HDFS state store on a cluster);
  *   - [[sessionsCustom]] uses `flatMapGroupsWithState` — the escape
  *     hatch for session semantics the built-in can't express (e.g.
  *     per-session event caps, custom merge rules). Keyed state lives in
  *     the state store per user_id; event-time timeout fires session
  *     emission once the watermark passes the gap.
  *
  * Scale shape: both shuffle once on `user_id` (the grouping key); state
  * per key is O(1) (current session bounds + count), not O(events). The
  * reference has no streaming surface at all (`SURVEY.md §2.6`) — this
  * is a north-star extension.
  */
object Sessionize {

  /** Epoch-nanos long → timestamp (microsecond precision, which is what
    * Spark timestamps carry). The ns → µs division runs in the DECIMAL
    * domain: Column `/` is a DOUBLE division, and epoch nanos (~1.7e18)
    * exceed 2^53, so the double path rounds the input by up to ~256 ns —
    * enough to flip a µs boundary and break exact batch/stream session
    * agreement at gap edges. Decimal division is exact; the long cast
    * truncates toward zero like integer `div`. */
  def tsCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((c.cast("decimal(20,0)") / lit(1000)).cast("long"))

  /** Session rows (user_id, session start/end, n_events) with a
    * `gap`-separated session definition. Works on batch and streaming
    * inputs unchanged. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_ts", tsCol(col("ts")))
      .groupBy(col("user_id"), session_window(col("event_ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Per-user session counts — on a batch input this must agree exactly
    * with the q13 lag/running-sum formulation (proved in ScalaTest). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    sessions(events, gap)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))

  final case class Event(user_id: Long, event_id: Long, ts: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, start_ns: Long, end_ns: Long, n_events: Long)

  /** Custom stateful sessionizer: one [[SessionState]] per user in the
    * state store; a batch of events extends or rolls the session; closed
    * sessions are emitted downstream. Timeout-driven emission of the
    * final open session uses event-time timeout (fires when the
    * watermark passes `gapNs` beyond the session end). */
  def sessionsCustom(events: Dataset[Event], gapNs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_ts", tsCol(col("ts")))
      .withWatermark("event_ts", "10 seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.end, s.n))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              cur match {
                // merge if the event is within gap of EITHER session edge —
                // a late-but-within-watermark event from a later trigger
                // batch can land before s.end (or even before s.start);
                // min/max keeps the bounds monotone instead of dragging
                // the session end backwards to e.ts
                case Some(s) if e.ts - s.end <= gapNs && s.start - e.ts <= gapNs =>
                  cur = Some(SessionState(math.min(s.start, e.ts), math.max(s.end, e.ts), s.n + 1))
                case Some(s) if s.start - e.ts > gapNs =>
                  // admitted-but-ancient outlier: more than gap BEFORE the
                  // current session, so it can never merge with it — emit
                  // it as its own closed single-event session and KEEP the
                  // newer state (replacing the state with the old lone
                  // event would wrongly close the current session and
                  // split its successors into a duplicate)
                  closed += Session(user, e.ts, e.ts, 1)
                case Some(s) =>
                  closed += Session(user, s.start, s.end, s.n)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark is gap past the session end
              state.setTimeoutTimestamp(s.end / 1000000L + gapNs / 1000000L)
            }
            closed.result().iterator
          }
      }
  }
}
