package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Skew, TextAnalysis}

/** Streaming trending terms — tumbling-window term frequencies over a
  * continuous document feed, the monitoring view a live ingestion
  * pipeline keeps ("what is the crawl suddenly full of?"): spam bursts,
  * scraped-boilerplate floods and event-driven topic spikes all surface
  * as a term whose windowed count jumps.
  *
  * ONE declarative frame serves batch and `readStream` inputs
  * (tokenize → explode → tumbling `window` → count), which is what the
  * spec's batch==stream equivalence leans on. On a stream the watermark
  * bounds state: Spark holds partial counts only for windows newer than
  * (max event time − delay) and finalizes a window when the watermark
  * passes its end — append mode then emits each (window, term) row
  * exactly once, and later-than-watermark stragglers are dropped rather
  * than corrupting closed windows.
  *
  * Scale shape: the explode is map-side; the only exchange is keyed on
  * (window, term) with map-side partial counts, so a trigger's shuffle
  * volume is the trigger's distinct (window, term) partials — never the
  * raw token stream. The per-window top-k cut for dashboards routes
  * through the q43 salted tournament ([[Skew.groupTopK]]) on the
  * finalized batch view, not a bare per-window window function.
  */
object TrendingStream {

  /** (window_start, window_end, term, n) term counts over tumbling
    * `windowDur` windows of `tsCol` event time. Works verbatim on a
    * batch frame (watermark is a no-op there) and on a streaming frame
    * (append-mode emission once the watermark closes a window). */
  def termCounts(docs: DataFrame, tsCol: String, textCol: String,
      windowDur: String, delay: String): DataFrame =
    docs
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), windowDur).as("w"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("w"), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("term"), col("n"))

  /** Top-`k` terms per finalized window by (n DESC, term) — the
    * dashboard cut, via the salted tournament so a hot window's
    * vocabulary never funnels through one task. */
  def topTerms(counts: DataFrame, k: Int, nSalts: Int = 8): DataFrame =
    Skew.groupTopK(counts, col("window_start"),
      Seq(col("n").desc, col("term").asc),
      Seq(col("n"), col("term")), n = k, nSalts = nSalts)
      .select(col("window_start"), col("term"), col("n"),
        col("rk").cast("int").as("rk"))
}
