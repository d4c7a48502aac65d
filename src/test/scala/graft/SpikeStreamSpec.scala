package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events
import graft.streaming.SpikeStream

/** Streaming spike detection: batch==stream equivalence against the
  * q117 rows-frame operator, exactly-once day finalization, and
  * closed-day immutability under stragglers. */
class SpikeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val DayNs = 86400L * 1000000000L

  /** (user, day, count) shorthand -> one tick per event, spread inside
    * the day so watermark advancement is driven by the last tick. */
  private def ticks(rows: Seq[(Long, Long, Int)]): Seq[(Long, Long)] =
    rows.flatMap { case (u, d, n) =>
      (1 to n).map(i => (u, d * DayNs + i * 1000000000L))
    }

  private def runStream(batches: Seq[Seq[(Long, Long)]]): Seq[SpikeStream.SpikeRow] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val query = SpikeStream.detect(
        stream.toDF().toDF("user_id", "ts"), window = 7, factor = 3)
      .writeStream.format("memory").queryName("spikes")
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table("spikes").as[SpikeStream.SpikeRow].collect().toSeq
    } finally query.stop()
  }

  private val feed = Seq(
    (1L, 1L, 2), (1L, 2L, 2), (1L, 3L, 2), (1L, 4L, 9), (1L, 5L, 2),
    (2L, 1L, 9), (2L, 2L, 1), (2L, 3L, 99),
    (3L, 1L, 1), (3L, 5L, 1), (3L, 6L, 1), (3L, 7L, 12)) // gap days

  test("stream equals the batch q117 operator on every finalized day") {
    val sentinel = Seq((999L, 40L * DayNs))
    val split = ticks(feed).sortBy(_._2).grouped(30).toSeq :+ sentinel
    val streamed = runStream(split)
      .filter(_.user_id != 999L)
      .map(r => (r.user_id, r.day, r.n_events, r.base_n, r.base_sum, r.is_spike))
      .sorted
    val batch = Events.spikeDetect(
        ticks(feed).toDF("user_id", "ts"), window = 7, factor = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSeq.sorted
    assert(streamed === batch)
    assert(streamed.count(_._6) === 2) // user 1 day 4, user 3 day 7
    // exactly-once: no (user, day) appears twice
    assert(streamed.map(t => (t._1, t._2)).distinct.size === streamed.size)
  }

  test("gap-day baseline counts observed days only (user 3)") {
    val split = Seq(ticks(feed), Seq((999L, 40L * DayNs)))
    val u3 = runStream(split).filter(_.user_id == 3L).sortBy(_.day)
    // days 1,5,6 then 12 events on day 7 against baseline {1,1,1}
    assert(u3.map(r => (r.day, r.base_n, r.base_sum, r.is_spike)) === Seq(
      (1L, 0L, 0L, false), (5L, 1L, 1L, false),
      (6L, 2L, 2L, false), (7L, 3L, 3L, true)))
  }

  test("a straggler for an already-finalized day cannot mutate or duplicate it") {
    val base = ticks(Seq((1L, 1L, 2), (1L, 2L, 3)))
    // watermark pushed past day 2's end, then a straggler lands on day 1
    val got = runStream(Seq(base, Seq((999L, 40L * DayNs)), Seq((1L, 1L * DayNs + 5L))))
      .filter(_.user_id == 1L).sortBy(_.day)
    assert(got.map(r => (r.day, r.n_events)) === Seq((1L, 2L), (2L, 3L)))
  }
}
