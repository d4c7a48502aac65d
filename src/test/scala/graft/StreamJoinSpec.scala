package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Sessionize, StreamJoin}
import graft.sources.Tables

/** Watermarked stream-stream interval correlation: the streamed result
  * must equal the same operator run over the data as one batch. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def asPairs(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("stream-stream correlate equals the batch correlate on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").as[Sessionize.Event].collect()
      .sortBy(_.ts) // arrival roughly follows event time, as in production

    val stream = MemoryStream[Sessionize.Event]
    val query = StreamJoin.correlate(stream.toDF(), stream.toDF())
      .writeStream.format("memory").queryName("stream_pairs")
      .outputMode("append").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      stream.addData(first.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(second.toIndexedSeq)
      query.processAllAvailable()
      val streamed = asPairs(spark.table("stream_pairs").collect())
      val batchDf = Tables.events(spark, sf).select("user_id", "event_id", "ts")
      val batch = asPairs(StreamJoin.correlate(batchDf, batchDf).collect())
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally query.stop()
  }

  test("correlate pairs are symmetric in time and bounded by the window") {
    import spark.implicits._
    val sec = 1000000000L
    // u1: e1 at t0, e2 at t0+30min (pair), e3 at t0+2h (no pair with e1;
    // pairs with e2? gap 90min > 1h -> no). e4 BEFORE e1 by 30min: must
    // still pair with e1 even though its id is LARGER (time order and id
    // order disagree — the two-sided range case)
    val t0 = 10 * 3600L * sec
    val events = Seq(
      Sessionize.Event(1L, 1L, t0),
      Sessionize.Event(1L, 2L, t0 + 1800 * sec),
      Sessionize.Event(1L, 3L, t0 + 7200 * sec),
      Sessionize.Event(1L, 4L, t0 - 1800 * sec),
      Sessionize.Event(2L, 5L, t0)).toDF()
    val got = asPairs(StreamJoin.correlate(events, events).collect())
    assert(got === Set((1L, 1L, 2L), (1L, 1L, 4L), (1L, 2L, 4L)))
  }
}
