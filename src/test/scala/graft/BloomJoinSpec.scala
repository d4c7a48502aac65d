package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin
import graft.sources.Tables

/** The bloom pre-filter must be semantically invisible: results equal the
  * plain left-semi join on every input, including ones engineered to
  * produce bloom false positives. */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloomSemiJoin equals the plain left-semi join") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i % 997, i)).toDF("fk", "payload")
    val dim = (1L to 300L).filter(_ % 3 == 0).map(k => Tuple1(k)).toDF("dk")
    val got = BloomJoin.bloomSemiJoin(fact, col("fk"), dim, col("dk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === plain)
    assert(plain.nonEmpty)
  }

  test("a tiny bloom (forced false positives) still yields the exact semi-join") {
    import spark.implicits._
    // 64 bits for 500 keys: the filter saturates, nearly every probe is a
    // false positive — the residual join must still remove all of them
    val fact = (1L to 2000L).map(i => Tuple1(i)).toDF("fk")
    val dim = (1L to 500L).filter(_ % 7 == 0).map(k => Tuple1(k)).toDF("dk")
    val got = BloomJoin.bloomSemiJoin(fact, col("fk"), dim, col("dk"),
        expectedItems = 500L, numBits = 64L)
      .collect().map(_.getLong(0)).toSet
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(got === plain)
  }

  test("empty dim yields an empty result, not a crash") {
    import spark.implicits._
    val fact = (1L to 100L).map(i => Tuple1(i)).toDF("fk")
    val dim = Seq.empty[Long].map(k => Tuple1(k)).toDF("dk")
    assert(BloomJoin.bloomSemiJoin(fact, col("fk"), dim, col("dk")).count() === 0L)
  }

  test("q50_bloom_semi runs over testdata and matches the unfiltered semi-join") {
    val got = SparkEntry.queries("q50_bloom_semi")(spark, sf).collect()
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_orderkey").collect()
    assert(got.map(_.toString).toSeq === plain.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }
}
