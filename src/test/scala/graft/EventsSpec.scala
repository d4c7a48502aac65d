package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Events-table analytics: gap-fill completeness and pivot zero-fill. */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("gapFilledDailyCounts fills every gap day with zero, spans are per-user") {
    import spark.implicits._
    val day = 86400000000000L
    // user 1: events on days 10, 10, 13 -> span 10..13 with 11,12 as gaps
    // user 2: one event on day 5 -> single-day span, no gaps
    val events = Seq(
      (1L, 100L, 10 * day + 5L), (1L, 101L, 10 * day + 99L), (1L, 102L, 13 * day),
      (2L, 200L, 5 * day + 42L))
      .toDF("user_id", "event_id", "ts")
    val got = Events.gapFilledDailyCounts(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Set(
      (1L, 10L, 2L), (1L, 11L, 0L), (1L, 12L, 0L), (1L, 13L, 1L),
      (2L, 5L, 1L))
    assert(got === expect)
  }

  test("q56 output is dense: every user's day range is complete") {
    val rows = SparkEntry.queries("q56_gapfill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2)
      assert(days.length === (days.max - days.min + 1).toInt,
        s"user $u has holes in the gap-filled range")
    }
    assert(rows.exists(_._3 == 0L), "expected at least one zero-filled gap day")
    assert(rows.map(_._3).sum === spark.read
      .parquet(s"$sf/events.parquet").count(), "gap-fill must preserve event totals")
  }

  test("funnel stages require strict temporal order, not mere presence") {
    val rows = SparkEntry.queries("q57_funnel")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // stage counts can only shrink down the funnel
    assert(rows("1_view") >= rows("2_click_after_view"))
    assert(rows("2_click_after_view") >= rows("3_purchase_after_click"))
    assert(rows("1_view") > 0)
  }

  test("retention: offset 0 row per cohort equals the cohort size") {
    val rows = SparkEntry.queries("q58_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every user is active in their own first week, so sum of offset-0
    // counts equals the number of distinct users
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._3).sum === users)
    // retention can never exceed the cohort's size
    val cohortSize = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (c, _, n) => assert(n <= cohortSize(c)) }
  }

  test("pivot coalesces missing (cohort, type) combinations to zero") {
    import spark.implicits._
    val events = Seq(
      (0L, "click"), (0L, "click"), (1L, "view"))
      .toDF("user_id", "event_type")
    val types = Seq("click", "view", "purchase")
    val p = events.groupBy((col("user_id") % 10).as("cohort"))
      .pivot("event_type", types).agg(count(lit(1)))
    val got = p.select(col("cohort") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("cohort")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 2L, 0L, 0L), (1L, 0L, 1L, 0L)))
  }

  test("spikeDetect: baseline frame, history floor, and the 3x cut are exact") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    // user 1: 2,2,2 then 9 (spike: 9*3 > 3*6), then 2 (not)
    // user 2: only 2 history days at day 3 -> never flagged
    val ev = Seq(
      (1L, 1L, 2), (1L, 2L, 2), (1L, 3L, 2), (1L, 4L, 9), (1L, 5L, 2),
      (2L, 1L, 9), (2L, 2L, 1), (2L, 3L, 99))
      .flatMap { case (u, d, n) => (1 to n).map(i => (u, d * day + i)) }
      .toDF("user_id", "ts")
    val got = Events.spikeDetect(ev, window = 7, factor = 3)
      .orderBy("user_id", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (1L, 1L, 2L, 0L, 0L, false),
      (1L, 2L, 2L, 1L, 2L, false),
      (1L, 3L, 2L, 2L, 4L, false),
      (1L, 4L, 9L, 3L, 6L, true),   // 9*3=27 > 3*6=18
      (1L, 5L, 2L, 4L, 15L, false),
      (2L, 1L, 9L, 0L, 0L, false),
      (2L, 2L, 1L, 1L, 9L, false),
      (2L, 3L, 99L, 2L, 10L, false))) // huge but only 2 history days
  }

  test("q117 flags at least one spike at sf0.001 and never without 3 history days") {
    val rows = SparkEntry.queries("q117_spike_detect")(spark, sf)
      .collect().map(r => (r.getLong(3), r.getBoolean(5)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (baseN, spike) => !spike || baseN >= 3 })
  }
}
