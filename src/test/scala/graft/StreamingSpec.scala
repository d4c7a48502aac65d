package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.sources.Tables

/** Structured Streaming sessionization: batch/stream equivalence and the
  * custom-state path. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("session_window batch counts agree with the q13 lag/running-sum formulation") {
    val events = Tables.events(spark, sf)
    val a = Sessionize.sessionCounts(events).select("user_id", "n_sessions", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = SparkEntry.queries("q13_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("session_window gap edge: events exactly `gap` apart MERGE (q94 oracle convention)") {
    import spark.implicits._
    // 30-minute gap in microseconds; three events: 0, gap (must merge with
    // 0), and 2*gap + 1us (must start a new session). Pins the `delta >
    // gap => new session` convention the q94 oracle SQL encodes.
    val gapUs = 1800000000L
    val df = Seq((1L, 0L), (1L, gapUs), (1L, 2 * gapUs + 1))
      .toDF("user_id", "tus")
      .withColumn("event_ts", timestamp_micros(col("tus")))
    val sessions = df
      .groupBy(col("user_id"), session_window(col("event_ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")), unix_micros(col("w.end")), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(sessions.toSeq === Seq(
      (0L, 2 * gapUs, 2L),                      // [0, gap] merged, end = gap + gap
      (2 * gapUs + 1, 3 * gapUs + 1, 1L)))      // the +1us event is a new session
  }

  test("q94 session bounds equal the lag/running-sum oracle formulation on real data") {
    // Re-derive the oracle SQL's shape in Spark (lag + gap flag + running
    // sum + per-session min/max) and compare per-row with the
    // session_window plan — the same equivalence DuckDB checks at sf0.01.
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("tus"))
    val w = Window.partitionBy("user_id").orderBy("tus")
    val oracle = ev
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("tus").as("s_start_us"),
        (max(col("tus")) + gapUs).as("s_end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "s_start_us", "s_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val q94 = SparkEntry.queries("q94_session_bounds")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(q94 === oracle)
    assert(q94.nonEmpty)
  }

  test("streaming content-hash dedup matches batch dropDuplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (doc_id, text, ts) rows; 8 distinct contents across 20 docs. All
    // duplicates land within the 1h watermark delay, so the
    // within-watermark dedup state never expires mid-test and the
    // streaming result must equal the batch result exactly.
    val base = (0L until 20L).map(i =>
      (i, s"document body number ${i % 8}",
        java.sql.Timestamp.valueOf(s"2026-01-01 10:${10 + i.toInt}:00")))
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("doc_id", "text", "ts")

    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = graft.streaming.DedupStream.dedupped(named(stream.toDF()), "ts", "1 hour")
      .select("content_hash")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      val (first, second) = base.splitAt(10)
      stream.addData(first.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(second.toIndexedSeq)
      query.processAllAvailable()
      val streamed = spark.table("stream_dedup")
        .collect().map(_.getString(0)).sorted.toSeq
      val batch = graft.streaming.DedupStream.dedupped(named(base.toDF()), "ts", "1 hour")
        .select("content_hash")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.size === 8) // one survivor per distinct content
    } finally query.stop()
  }

  test("session_window over a MemoryStream matches the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").as[Sessionize.Event].collect()

    val stream = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessions(stream.toDF())
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("complete").start()
    try {
      // feed in two chunks to exercise incremental state
      val (first, second) = events.splitAt(events.length / 2)
      stream.addData(first.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(second.toIndexedSeq)
      query.processAllAvailable()
      val streamed = spark.table("stream_sessions")
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = Sessionize.sessionCounts(Tables.events(spark, sf))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("custom sessionizer keeps session bounds monotone under late-but-within-watermark events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 1800L * 1000000000L
    val sec = 1000000000L
    val t0 = 3600L * sec
    val stream = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessionsCustom(stream.toDS(), gapNs)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // batch 1: session [t0, t0+15s]; watermark advances to t0+5s
      stream.addData(Seq(Sessionize.Event(1L, 1L, t0), Sessionize.Event(1L, 2L, t0 + 15 * sec)))
      query.processAllAvailable()
      // batch 2: late event at t0+8s — above the watermark, inside the
      // session. Must merge WITHOUT dragging the session end backwards.
      stream.addData(Seq(Sessionize.Event(1L, 3L, t0 + 8 * sec)))
      query.processAllAvailable()
      // flush via far-future watermark advances
      stream.addData(Seq(Sessionize.Event(99L, 999L, 100L * 3600 * sec)))
      query.processAllAvailable()
      stream.addData(Seq(Sessionize.Event(99L, 1000L, 200L * 3600 * sec)))
      query.processAllAvailable()
      val out = spark.table("late_sessions").as[Sessionize.Session]
        .collect().filter(_.user_id == 1L)
      assert(out.length === 1)
      assert(out.head.n_events === 3L)
      assert(out.head.start_ns === t0)            // not moved by the late event
      assert(out.head.end_ns === t0 + 15 * sec)   // NOT dragged back to t0+8s
    } finally query.stop()
  }

  test("custom sessionizer: an admitted ancient outlier closes as its own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val s = 1000000000L // 1s in ns
    val gapNs = 5L * s
    val stream = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessionsCustom(stream.toDS(), gapNs)
      .writeStream.format("memory").queryName("outlier_sessions")
      .outputMode("append").start()
    try {
      stream.addData(Seq(Sessionize.Event(1L, 1L, 100L * s)))
      query.processAllAvailable()
      // watermark is now 90s; 92s is late but admitted, and more than
      // gap BEFORE the open [100,100] session — it must close alone and
      // MUST NOT replace the newer state
      stream.addData(Seq(Sessionize.Event(1L, 2L, 92L * s)))
      query.processAllAvailable()
      stream.addData(Seq(Sessionize.Event(1L, 3L, 101L * s)))
      query.processAllAvailable()
      stream.addData(Seq(Sessionize.Event(99L, 9L, 1000L * s)))
      query.processAllAvailable()
      stream.addData(Seq(Sessionize.Event(99L, 10L, 2000L * s)))
      query.processAllAvailable()
      val out = spark.table("outlier_sessions").as[Sessionize.Session]
        .collect().filter(_.user_id == 1L)
        .map(ss => (ss.start_ns / s, ss.end_ns / s, ss.n_events)).sorted.toSeq
      // batch semantics: sessions {92} and {100, 101}
      assert(out === Seq((92L, 92L, 1L), (100L, 101L, 2L)))
    } finally query.stop()
  }

  test("streaming CDC latest-per-key converges to the batch q68 aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.Version
    // 40 versions over 6 keys, shuffled order, with a same-ts tiebreak
    // pair and a late (out-of-order) old version for key 0
    val versions = ((0 until 36).map { i =>
      Version(i % 6L, 1000L + (i / 6) * 10, 100L + i, s"t${i % 4}", i.toDouble)
    } ++ Seq(
      Version(0L, 1050L, 900L, "tie_lo", 1.0),
      Version(0L, 1050L, 901L, "tie_hi", 2.0),
      Version(0L, 10L, 999L, "ancient", 3.0),
      Version(5L, 1050L, 902L, "solo", 4.0))).toVector
    val stream = MemoryStream[Version]
    val query = CdcStream.latestPerKey(stream.toDS())
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("update").start()
    try {
      val (first, second) = versions.splitAt(20)
      stream.addData(first)
      query.processAllAvailable()
      stream.addData(second)
      query.processAllAvailable()
      // update-mode memory sink appends each trigger's refreshed rows;
      // the final state per key is the row with the highest n_versions
      val streamed = spark.table("cdc_stream").as[CdcStream.Current].collect()
        .groupBy(_.user_id).map(_._2.maxBy(_.n_versions)).toSeq.sortBy(_.user_id)
      val batchTyped = CdcStream.latestPerKey(versions.toDS())
        .collect().toSeq.sortBy(_.user_id)
      val batchAgg = graft.operators.SnapshotDiff.latestByKey(
          versions.toDF(), key = Seq("user_id"), ts = "ts",
          tiebreak = "event_id", payload = Seq("event_type", "value"))
        .select("user_id", "last_ts", "last_event_id", "last_event_type",
          "last_value", "n_versions")
        .as[CdcStream.Current].collect().toSeq.sortBy(_.user_id)
      assert(streamed === batchTyped)
      assert(streamed === batchAgg)
      // the same-ts pair resolved by the tiebreak, not arrival order
      assert(streamed.find(_.user_id == 0L).get.last_event_type === "tie_hi")
    } finally query.stop()
  }

  test("batch dedup survivor is the deterministic earliest-ts row") {
    import spark.implicits._
    // same content, doc 20 arrives EARLIER than doc 10; survivor must be
    // doc 20 regardless of scan order/partitioning
    val rows = Seq(
      (10L, "same body", java.sql.Timestamp.valueOf("2026-01-01 10:30:00")),
      (20L, "same body", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (30L, "other body", java.sql.Timestamp.valueOf("2026-01-01 10:05:00")))
    val out = graft.streaming.DedupStream.dedupped(
        rows.toDF("doc_id", "text", "ts").repartition(7), "ts")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(20L, 30L))
  }

  test("map-only text operators run unchanged on a stream: langQuality batch == stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The admission scorer (q15) is pure per-row work, so the SAME
    // DataFrame code must run on a readStream source with no rewrite and
    // produce identical rows — this is the property that lets the whole
    // quality/PII/decontamination family run as a streaming ingest filter.
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = graft.operators.TextAnalysis.langQuality(
        stream.toDF().toDF("doc_id", "lang", "text"))
      .select("doc_id", "pred_lang", "quality")
      .writeStream.format("memory").queryName("stream_lq")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("stream_lq")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
      val batch = graft.operators.TextAnalysis.langQuality(
          Tables.documents(spark, sf).select("doc_id", "lang", "text"))
        .select("doc_id", "pred_lang", "quality")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("flatMapGroupsWithState custom sessionizer closes sessions correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 1800L * 1000000000L
    val h = 3600L * 1000000000L // 1h in ns
    // user 1: two sessions (events 1h apart); user 2: one session
    val data = Seq(
      Sessionize.Event(1L, 1L, h), Sessionize.Event(1L, 2L, h + 1000000000L),
      Sessionize.Event(1L, 3L, 3 * h),
      Sessionize.Event(2L, 4L, h))
    val stream = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessionsCustom(stream.toDS(), gapNs)
      .writeStream.format("memory").queryName("custom_sessions")
      .outputMode("append").start()
    try {
      stream.addData(data)
      query.processAllAvailable()
      // advance the watermark far past everything to flush open sessions
      stream.addData(Seq(Sessionize.Event(99L, 999L, 100 * h)))
      query.processAllAvailable()
      stream.addData(Seq(Sessionize.Event(99L, 1000L, 200 * h)))
      query.processAllAvailable()
      val out = spark.table("custom_sessions").as[Sessionize.Session]
        .collect().filter(_.user_id != 99L)
        .map(s => (s.user_id, s.n_events)).sorted.toSeq
      // user 1 -> sessions of 2 and 1 events; user 2 -> 1 session of 1
      assert(out === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    } finally query.stop()
  }
}
