package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotDiff
import graft.sources.Tables

/** Snapshot classification semantics on handcrafted snapshots. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("diffCounts classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val before = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta"))
      .toDF("doc_id", "text")
    val after = Seq(
      (2L, "bravo"),          // unchanged
      (3L, "charlie EDIT"),   // changed
      (4L, "delta"),          // unchanged
      (5L, "echo"))           // added; 1L removed
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diffCounts(before, after)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 2L))
  }

  test("NULL text means present-with-null, never absent") {
    import spark.implicits._
    val before = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("doc_id", "text")
    val after = Seq((2L, None), (3L, Some("filled")))
      .toDF("doc_id", "text") // 1 removed; 2 unchanged (both NULL); 3 changed
    val got = SnapshotDiff.diffCounts(before, after)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L))
  }

  test("identical snapshots are all unchanged; disjoint are all added+removed") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val same = SnapshotDiff.diffCounts(a, a)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(same === Map("unchanged" -> 2L))
    val b = Seq((3L, "z")).toDF("doc_id", "text")
    val disjoint = SnapshotDiff.diffCounts(a, b)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(disjoint === Map("removed" -> 2L, "added" -> 1L))
  }

  test("q59 exercises every status bucket and conserves totals") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q59_snapshot_diff")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.keySet === Set("added", "removed", "changed", "unchanged"))
    val docs = Tables.documents(spark, sf)
    val nBefore = docs.filter(col("doc_id") % 7 =!= 0).count()
    val nAfter = docs.filter(col("doc_id") % 5 =!= 0).count()
    assert(got("removed") + got("changed") + got("unchanged") === nBefore)
    assert(got("added") + got("changed") + got("unchanged") === nAfter)
  }

  test("refreshAgg: update pair cancels, full deletion drops group, insert births group") {
    import spark.implicits._
    val keys = Seq("k")
    def m(df: org.apache.spark.sql.DataFrame) =
      Seq("sum_v" -> col("v").cast("decimal(18,2)"))
    // state from base rows: a={10,20}, b={5}, c={7}
    val base = Seq(("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", 7.0))
      .toDF("k", "v")
    val state = SnapshotDiff.signedState(base, lit("I"), keys, m(base))
    // delta: update a(10->11) as D+I; delete ALL of b; insert new group d
    val delta = Seq(
      ("a", 10.0, "D"), ("a", 11.0, "I"),
      ("b", 5.0, "D"),
      ("d", 3.0, "I"), ("d", 4.0, "I"))
      .toDF("k", "v", "op")
    val got = SnapshotDiff
      .refreshAgg(state, delta, col("op"), keys, m(delta))
      .select(col("k"), col("n_rows"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === Set(("a", 2L, 31.0), ("c", 1L, 7.0), ("d", 2L, 7.0)))
  }

  test("refreshAgg heals a group born and fully deleted within one batch") {
    import spark.implicits._
    val state = SnapshotDiff.signedState(
      Seq(("a", 2.0)).toDF("k", "v"), lit("I"), Seq("k"),
      Seq("sum_v" -> col("v").cast("decimal(18,2)")))
    val delta = Seq(("z", 9.0, "I"), ("z", 9.0, "D"))
      .toDF("k", "v", "op")
    val got = SnapshotDiff.refreshAgg(state, delta, col("op"), Seq("k"),
        Seq("sum_v" -> col("v").cast("decimal(18,2)")))
      .collect().map(_.getString(0)).toSet
    assert(got === Set("a"))
  }

  test("scd2: run collapse, interval closure, is_current, and ts ties") {
    import spark.implicits._
    // user 1: A,A,B,A (runs collapse; B reopens A as version 3)
    // user 2: single event -> one open version
    // user 3: ts tie at 10 settled by event_id (5:"X" then 6:"Y")
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      (2L, 15L, 7L, "Z"),
      (3L, 10L, 6L, "Y"), (3L, 10L, 5L, "X"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = SnapshotDiff.scd2(log, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (1L, 1, "A", 10L, 30L, false),
      (1L, 2, "B", 30L, 40L, false),
      (1L, 3, "A", 40L, -1L, true),
      (2L, 1, "Z", 15L, -1L, true),
      (3L, 1, "X", 10L, 10L, false),   // tie: event_id 5 precedes 6
      (3L, 2, "Y", 10L, -1L, true)))
  }

  test("scd2: intervals tile each entity's history; exactly one current") {
    val out = SparkEntry.queries("q112_scd2")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      assert(sorted.count(_.getBoolean(5)) === 1)
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3)) // valid_to == next valid_from
          assert(a.getString(2) !== b.getString(2)) // versions are real changes
        case _ =>
      }
    }
    // no unpartitioned window anywhere in the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"))
  }

  test("mergeInto: delete, update, insert, upsert-insert, no-op delete, passthrough") {
    import spark.implicits._
    val target = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null.asInstanceOf[String], 40.0))
      .toDF("k", "name", "bal")
    val batch = Seq(
      (2L, "D", null, 0.0),          // delete existing
      (3L, "U", "c2", 33.0),         // update existing
      (5L, "I", "e", 50.0),          // plain insert
      (6L, "U", "f", 60.0),          // upsert: update of missing key inserts
      (9L, "D", null, 0.0))          // delete of missing key: no-op
      .toDF("k", "__op", "name", "bal")
    val got = SnapshotDiff.mergeInto(target, batch, "k", Seq("name", "bal"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "a", 10.0),      // untouched
      (3L, "c2", 33.0),     // updated
      (4L, null, 40.0),     // NULL payload row survives untouched
      (5L, "e", 50.0),
      (6L, "f", 60.0)))
  }

  test("q82 state+delta equals full recompute (differential on sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q82_incr_refresh")(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val eff = li.filter(col("l_orderkey") % 10 =!= 0 &&
        col("l_orderkey") % 7 =!= 0)
      .unionByName(li.filter(col("l_orderkey") % 10 === 0))
    val want = SnapshotDiff.signedState(eff, lit("I"),
        Seq("l_returnflag", "l_linestatus"),
        Seq("sum_qty" -> col("l_quantity").cast("decimal(18,2)"),
          "sum_price" -> col("l_extendedprice").cast("decimal(18,2)")))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(got.collect().toSeq === want.collect().toSeq)
    assert(got.count() > 0)
  }
}
