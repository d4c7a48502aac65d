package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream self-join — the streaming twin of the q49
  * batch interval-overlap join: correlate each event with the SAME
  * user's events within `window` of it, as both sides arrive
  * incrementally.
  *
  * Structured Streaming executes this with a symmetric-hash-join whose
  * buffered state is BOUNDED by the watermark plus the time-range join
  * condition: a left row can only ever match right rows in
  * [l.ts, l.ts + window], so once the watermark passes a row's upper
  * bound the state store evicts it. Without the range condition (or the
  * watermarks) the join would have to buffer both streams forever —
  * the unbounded-state failure mode this operator exists to avoid.
  *
  * Event-time comes from the events table's epoch-nano `ts` via
  * [[Sessionize.tsCol]] (exact decimal ns→µs conversion). The equi-key
  * (`user_id`) keeps the join a hash shuffle on both sides, same as
  * the batch plan's (key, cell) equi-join.
  */
object StreamJoin {

  /** Pairs (user_id, event_a, event_b) of same-user events within
    * `window` of each other (|Δts| <= window), event_a < event_b —
    * the q49 batch overlap-pair semantics for equal-length intervals,
    * evaluated in the MICROSECOND domain (Spark timestamps): a pair
    * whose nano delta straddles the window boundary within one µs can
    * classify differently than q49's integer-nano math, so parity with
    * q49 is exact only for µs-aligned timestamps. The range is
    * two-sided on purpose: it both matches the batch semantics and
    * gives the state store an eviction bound for EACH side. Works on
    * batch and streaming inputs; on streams, both sides must carry the
    * `delay` watermark for state eviction. */
  def correlate(left: DataFrame, right: DataFrame,
      window: String = "1 hour", delay: String = "10 seconds"): DataFrame = {
    val a = left
      .withColumn("a_ts", Sessionize.tsCol(col("ts")))
      .withWatermark("a_ts", delay)
      .select(col("user_id").as("a_user"), col("event_id").as("event_a"), col("a_ts"))
    val b = right
      .withColumn("b_ts", Sessionize.tsCol(col("ts")))
      .withWatermark("b_ts", delay)
      .select(col("user_id").as("b_user"), col("event_id").as("event_b"), col("b_ts"))
    a.join(b,
      col("a_user") === col("b_user") &&
      col("event_a") < col("event_b") &&
      col("b_ts") >= col("a_ts") - expr(s"INTERVAL $window") &&
      col("b_ts") <= col("a_ts") + expr(s"INTERVAL $window"))
      .select(col("a_user").as("user_id"), col("event_a"), col("event_b"))
  }
}
