package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The action-free scan-split estimate behind [[Tables.rebalanced]]
  * (round-8 fix: the probe used to force `df.rdd` materialization of
  * the scan lineage). The estimate replays `FilePartition`'s split
  * arithmetic from the cached file listing, so it must agree EXACTLY
  * with the RDD-derived partition count on real file scans — asserted
  * here on every test table and both sf tiers, plus the non-file and
  * shuffle-shaped pass-through cases. */
class RebalanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("estimate equals the RDD-derived split count on every test table") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         t <- Tables.names) {
      val df = Tables.load(spark, sf, t)
      val est = Tables.estimatedScanPartitions(df)
      assert(est.isDefined, s"$sf/$t: no estimate for a plain file scan")
      assert(est.get === df.rdd.getNumPartitions, s"$sf/$t")
    }
  }

  test("estimate survives projection and filter on top of the scan") {
    val df = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text").filter(col("doc_id") % 2 === 0)
    assert(Tables.estimatedScanPartitions(df)
      === Some(df.rdd.getNumPartitions))
  }

  test("non-file leaves yield no estimate (pass-through, no job)") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Tables.estimatedScanPartitions(local).isEmpty)
    // rebalanced must leave the frame untouched rather than guess
    assert(Tables.rebalanced(local).queryExecution.optimizedPlan
      === local.queryExecution.optimizedPlan)
  }

  test("shuffle-shaped plans pass through untouched") {
    val agg = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(Tables.rebalanced(agg).queryExecution.logical
      === agg.queryExecution.logical)
  }

  test("rebalanced still spreads a single-split scan across the cores") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assume(Tables.estimatedScanPartitions(docs).exists(
      _ < spark.sparkContext.defaultParallelism))
    val out = Tables.rebalanced(docs)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }
}
