package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketed
import graft.sources.Tables

/** Bucketing must (a) change nothing semantically and (b) actually
  * eliminate the join/aggregate exchanges — (b) is the entire point, so
  * it is asserted on the EXECUTED plan, not assumed. */
class BucketedSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketedOrderJoin equals the plain join/aggregate") {
    val got = Bucketed.bucketedOrderJoin(spark, sf, nBuckets = 4)
      .orderBy("l_orderkey", "o_orderpriority").collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_orderkey", "o_orderpriority").collect()
    assert(got.map(_.toString).toSeq === plain.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }

  test("the bucketed join and aggregate run with zero shuffle exchanges") {
    val df = Bucketed.bucketedOrderJoin(spark, sf, nBuckets = 4)
    df.collect() // execute so AQE finalizes the plan
    val shuffles = collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected an exchange-free bucketed join, found:\n${df.queryExecution.executedPlan}")
  }

  test("table creation is idempotent within a catalog") {
    val t1 = Bucketed.bucketedTable(spark, sf, "orders", "o_orderkey", 4)
    val t2 = Bucketed.bucketedTable(spark, sf, "orders", "o_orderkey", 4)
    assert(t1 === t2)
    assert(spark.catalog.tableExists(t1))
  }
}
