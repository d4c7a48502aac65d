package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join composition semantics: latest-at-or-before match, ties,
  * inner-drop of unmatched rows. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOfJoin picks the latest right row at-or-before each left ts, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"), (2L, 10L, "c"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, 8L, 100L), (1L, 15L, 101L), (1L, 20L, 102L), (2L, 50L, 200L))
      .toDF("user_id", "ts", "cp_id")
    val out = AsOf.asOfJoin(left, right, "user_id", "ts")
      .select("user_id", "ts", "tag", "cp_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(out === Set(
      (1L, 10L, "a", 100L),   // 8 <= 10 < 15
      (1L, 20L, "b", 102L)))  // exact-ts tie matches (>= semantics)
    // "early" (ts=5, nothing before) and user 2 (first cp at 50 > 10) dropped
  }

  test("asOfJoin carries right payload across multiple left rows") {
    val left = (1L to 6L).map(t => (7L, t * 10, s"e$t")).toDF("user_id", "ts", "tag")
    val right = Seq((7L, 25L, 1L)).toDF("user_id", "ts", "cp_id")
    val out = AsOf.asOfJoin(left, right, "user_id", "ts")
      .collect().map(_.getAs[String]("tag")).toSet
    assert(out === Set("e3", "e4", "e5", "e6")) // ts 30..60 all see cp at 25
  }

  test("asOfJoin carries a right row with NULL payload values atomically") {
    val left = Seq((1L, 20L, "l1"), (1L, 30L, "l2")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, 5L, Option(3L), Option(4L)), (1L, 15L, Option.empty[Long], Option(7L)))
      .toDF("user_id", "ts", "x", "y")
    val out = AsOf.asOfJoin(left, right, "user_id", "ts")
      .select("tag", "x", "y").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    // both left rows must see the newest right row AS IT IS (x=null, y=7);
    // per-column carrying would stitch the older x=3 onto the newer y=7 —
    // a composite right row that never existed
    assert(out === Set(("l1", None, Some(7L)), ("l2", None, Some(7L))))
  }

  test("asOfJoin matches against a payload-less right frame (existence-only)") {
    val left = Seq((1L, 10L, "late"), (1L, 2L, "early")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, 5L)).toDF("user_id", "ts")
    val out = AsOf.asOfJoin(left, right, "user_id", "ts")
      .collect().map(_.getAs[String]("tag")).toSet
    assert(out === Set("late")) // ts=2 precedes every right row -> dropped
  }

  test("asOfJoin rejects colliding left/right payload column names") {
    val left = Seq((1L, 10L, "v")).toDF("user_id", "ts", "payload")
    val right = Seq((1L, 5L, "w")).toDF("user_id", "ts", "payload")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right, "user_id", "ts")
    }
    assert(e.getMessage.contains("payload"))
  }

  test("asOfJoinForward picks the earliest right row at-or-after each left ts") {
    val left = Seq((1L, 3L, "a"), (1L, 5L, "b"), (1L, 9L, "c"), (2L, 1L, "d"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, 5L, 50L), (1L, 8L, 80L), (2L, 0L, 0L))
      .toDF("user_id", "ts", "r")
    val out = AsOf.asOfJoinForward(left, right, "user_id", "ts")
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("r"))).toSet
    // a(3)->r@5; b(5)->r@5 (at-or-after includes equality); c(9) has no
    // later right row -> dropped; d(1) has only an EARLIER right row -> dropped
    assert(out === Set(("a", 50L), ("b", 50L)))
    // round-trip: the caller's ts values come back un-negated
    val ts = AsOf.asOfJoinForward(left, right, "user_id", "ts")
      .select("ts").collect().map(_.getLong(0)).toSet
    assert(ts === Set(3L, 5L))
  }
}
