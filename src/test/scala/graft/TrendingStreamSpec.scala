package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TrendingStream

/** Streaming trending terms (X82): batch==stream equivalence of the
  * tumbling-window term counts, watermark finalization semantics, and
  * the tournament-based per-window top-k cut. */
class TrendingStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  // two 10-minute windows: [10:00,10:10) spam burst, [10:10,10:20) mixed
  private val feed = Seq(
    (ts(1), "buy cheap pills now"),
    (ts(3), "buy cheap pills today"),
    (ts(5), "weather report sunny"),
    (ts(11), "election results tonight"),
    (ts(13), "election coverage live"),
    (ts(15), "weather warning issued"))

  test("windowed term counts: stream (append mode) equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val query = TrendingStream.termCounts(
        stream.toDF().toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    try {
      val (first, rest) = feed.splitAt(3)
      stream.addData(first)
      query.processAllAvailable()
      stream.addData(rest)
      query.processAllAvailable()
      // append mode emits only watermark-closed windows: advance the
      // watermark past the second window's end with a late sentinel
      stream.addData(Seq((ts(30), "flush")))
      query.processAllAvailable()
      val streamed = spark.table("trending")
        .select("window_start", "term", "n")
        .collect().map(_.toString).toSet
      val batch = TrendingStream.termCounts(
          feed.toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
        .select("window_start", "term", "n")
        .collect().map(_.toString).toSet
      // every batch row must be finalized and emitted by the stream
      // (the flush sentinel's own window may remain open — exclude it)
      val flushWindow = streamed.filter(_.contains("flush"))
      assert(batch.subsetOf(streamed -- flushWindow))
    } finally query.stop()
  }

  test("batch counts are the plain tokenize-explode group-by") {
    val got = TrendingStream.termCounts(
        feed.toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
    val w1 = ts(0)
    val w2 = ts(10)
    assert(got.contains((w1, "buy", 2L)))
    assert(got.contains((w1, "cheap", 2L)))
    assert(got.contains((w1, "pills", 2L)))
    assert(got.contains((w2, "election", 2L)))
    assert(got.contains((w1, "weather", 1L)))
    assert(got.contains((w2, "weather", 1L)))
    // window bounds are the tumbling grid, not event times
    assert(got.forall { case (s, _, _) => s == w1 || s == w2 })
  }

  test("top-k per window is deterministic and tournament-ranked") {
    val counts = TrendingStream.termCounts(
      feed.toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
    val top = TrendingStream.topTerms(counts, k = 3)
      .orderBy("window_start", "rk").collect()
    val byWindow = top.groupBy(_.getTimestamp(0))
    byWindow.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).toSeq === (1 to rows.length))
      // ranks follow (n DESC, term ASC)
      val keys = rows.map(r => (-r.getLong(2), r.getString(1))).toSeq
      assert(keys === keys.sorted)
    }
    // the spam burst dominates window 1's top-3
    val w1top = byWindow(ts(0)).map(_.getString(1)).toSet
    assert(w1top === Set("buy", "cheap", "pills"))
  }

  test("later-than-watermark stragglers do not corrupt closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val query = TrendingStream.termCounts(
        stream.toDF().toDF("ts", "text"), "ts", "text", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("trending_late")
      .outputMode("append").start()
    try {
      stream.addData(Seq((ts(1), "alpha alpha"), (ts(3), "alpha")))
      query.processAllAvailable()
      // advance watermark far past window 1 → it finalizes at n=3
      stream.addData(Seq((ts(45), "advance")))
      query.processAllAvailable()
      // a straggler for the closed window must be dropped
      stream.addData(Seq((ts(2), "alpha")))
      query.processAllAvailable()
      val alpha = spark.table("trending_late")
        .filter(col("term") === "alpha").collect()
      assert(alpha.length === 1)
      assert(alpha.head.getAs[Long]("n") === 3L)
    } finally query.stop()
  }
}
