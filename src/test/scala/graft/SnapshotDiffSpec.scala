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
