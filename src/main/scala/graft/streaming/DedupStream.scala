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
    * both bounds state and admits `delay` of disorder. */
  def dedupped(docs: DataFrame, tsCol: String, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", sha2(TextAnalysis.norm(col("text")), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicates("content_hash")
}
