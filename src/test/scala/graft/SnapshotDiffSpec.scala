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
}
