package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming exact deduplication — the Structured Streaming twin of the
  * batch q16 content-hash dedup, for continuous ingestion pipelines
  * (crawl feeds) where duplicates must be dropped before they reach
  * storage.
  *
  * The same declarative frame works on batch and `readStream` inputs:
  * normalize → SHA-256 content hash → `dropDuplicates` on the digest.
  * On a stream, `withWatermark` bounds the dedup state: Spark keeps one
  * state-store entry per distinct hash and expires entries once the
  * watermark passes `delay` — the standard bounded-state trade
  * (duplicates farther apart than `delay` in event time are no longer
  * caught; an exactly-once global dedup would need unbounded state).
  *
  * Scale shape: one shuffle keyed on the 64-hex digest (72 bytes/doc,
  * never the body), state O(distinct hashes within the watermark).
  */
object DedupStream {

  /** First arrival per distinct normalized content hash. `tsCol` is an
    * event-time TIMESTAMP column; on a streaming input the watermark
    * both bounds state and admits `delay` of disorder.
    *
    * Uses `dropDuplicatesWithinWatermark`, NOT plain `dropDuplicates`:
    * the plain form only expires dedup state when the event-time column
    * is itself part of the key subset, so keying on the hash alone would
    * grow state forever — the WithinWatermark variant keys on the hash
    * and still expires each entry once the watermark passes its event
    * time plus the delay (duplicates farther apart than the delay are
    * deliberately re-admitted). The WithinWatermark variant is
    * streaming-only, so a batch input takes plain dropDuplicates — the
    * exact semantics the streaming form converges to when every
    * duplicate lands inside the delay, which the equivalence test
    * exercises. */
  def dedupped(docs: DataFrame, tsCol: String, delay: String = "10 minutes"): DataFrame = {
    val hashed = docs
      .withColumn("content_hash", sha2(TextAnalysis.norm(col("text")), 256))
    if (hashed.isStreaming)
      hashed.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("content_hash")
    else
      hashed.dropDuplicates("content_hash")
  }
}
