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
}
