package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming spike detection — the stateful twin of the batch q117
  * rolling spike detector (`Events.spikeDetect`): per-user daily event
  * volume flagged against the trailing baseline of up to `window`
  * OBSERVED days, continuously, as the watermark closes each day.
  *
  * Why custom state: the batch formulation is a rows-frame window
  * function (`ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING`), which
  * Structured Streaming cannot run declaratively — this is exactly the
  * `flatMapGroupsWithState` escape hatch (the [[Sessionize]] pattern).
  * Per-user state is O(window + open days): a count map for days the
  * watermark has not closed, the ring of the last ≤ `window` finalized
  * (day, n) pairs, and the finalization high-water mark — never the
  * event history.
  *
  * Semantics contract with the batch twin, proved in `SpikeStreamSpec`:
  * a day is finalized (emitted exactly once, in day order) when the
  * watermark passes its end; its baseline is the trailing finalized
  * observed days — identical to the batch rows-frame — so every emitted
  * row equals the batch operator's row for the same (user, day).
  * Within-delay stragglers for a not-yet-closed day still count;
  * events for an already-finalized day are dropped (the append-mode
  * contract: closed results are immutable) — the `done` high-water
  * mark guards the duplicate-emission path a bare count map would hit.
  * Event-time timeout flushes users whose feed goes quiet.
  */
object SpikeStream {

  final case class Tick(user_id: Long, ts: Long)
  final case class DayCount(day: Long, n: Long)
  final case class SpikeGroupState(open: Map[Long, Long],
      hist: List[DayCount], done: Long)
  final case class SpikeRow(user_id: Long, day: Long, n_events: Long,
      base_n: Long, base_sum: Long, is_spike: Boolean)

  private val DayNs = 86400L * 1000000000L
  private val DayMs = 86400L * 1000L

  /** Continuous spike rows over an events frame (user_id, ts as epoch
    * nanos). Works on a `readStream` source; the batch equivalence
    * target is `Events.spikeDetect` (same window/factor). */
  def detect(events: DataFrame, window: Int, factor: Int,
      delay: String = "10 seconds"): Dataset[SpikeRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_ts", Sessionize.tsCol(col("ts")))
      .withWatermark("event_ts", delay)
      .select(col("user_id"), col("ts"), col("event_ts"))
      .as[Tick]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SpikeGroupState, SpikeRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Tick], state: GroupState[SpikeGroupState]) =>
          val st = state.getOption.getOrElse(
            SpikeGroupState(Map.empty, Nil, Long.MinValue))
          // accumulate this trigger's events into open-day counts;
          // days at or below the finalization mark are immutable
          var open = st.open
          batch.foreach { t =>
            val day = Math.floorDiv(t.ts, DayNs)
            if (day > st.done)
              open = open.updated(day, open.getOrElse(day, 0L) + 1L)
          }
          // finalize every open day the watermark has passed, oldest
          // first, feeding each into the next one's baseline
          val wmMs = state.getCurrentWatermarkMs()
          val ready = open.keys.filter(d => (d + 1) * DayMs <= wmMs).toSeq.sorted
          var hist = st.hist
          var done = st.done
          val out = ready.map { d =>
            val n = open(d)
            open -= d
            val baseN = hist.size.toLong
            val baseSum = hist.map(_.n).sum
            val spike = baseN >= 3 && n * baseN > factor * baseSum
            hist = (hist :+ DayCount(d, n)).takeRight(window)
            done = d
            SpikeRow(user, d, n, baseN, baseSum, spike)
          }
          state.update(SpikeGroupState(open, hist, done))
          // wake this user when the earliest still-open day can close,
          // even if its feed goes quiet (timeout re-enters with an
          // empty batch and the finalize pass above runs again)
          if (open.nonEmpty)
            state.setTimeoutTimestamp((open.keys.min + 1) * DayMs)
          out.iterator
      }
  }
}
