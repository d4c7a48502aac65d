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
    * streaming-only, so a batch input instead keeps the MINIMUM
    * (event-time, payload) row per hash — "first arrival" made
    * deterministic: a plain `dropDuplicates` keeps whichever duplicate a
    * task happens to scan first, so the surviving doc_id/payload would
    * change across runs and partitionings. The batch pick is the
    * earliest event time (ties broken by the remaining column values),
    * which is what the streaming form converges to when every duplicate
    * lands inside the delay — the equivalence test exercises exactly
    * that. */
  def dedupped(docs: DataFrame, tsCol: String, delay: String = "10 minutes"): DataFrame = {
    val hashed = docs
      .withColumn("content_hash", sha2(TextAnalysis.norm(col("text")), 256))
    if (hashed.isStreaming)
      hashed.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("content_hash")
    else {
      val cols = docs.columns.toSeq
      hashed.groupBy("content_hash")
        .agg(min(struct(col(tsCol).as("__ts0") +: cols.map(col): _*)).as("__first"))
        .select(cols.map(c => col(s"__first.$c").as(c)) :+ col("content_hash"): _*)
    }
  }
}
