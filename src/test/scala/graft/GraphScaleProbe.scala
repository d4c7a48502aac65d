package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Ad-hoc scaling probe for the q114 PageRank row (run via
  * `Test/runMain graft.GraphScaleProbe [sfDir] [stressRoot]`): times 15
  * power-iteration rounds over the purchase graph at the sf0.1 tier and
  * over the 10× stress orders/lineitem replicas — the same-day A/B
  * evidence for the r15 verdict's co-partitioning item. */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-graph-scale-probe")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val stressRoot = if (args.length > 1) args(1)
      else "target/stress_sf1_s9999999_v4"
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    timed("pagerank_1x") {
      Graph.pageRank(Graph.purchaseEdges(spark, sfDir),
        damping = 0.85, iters = 15).count()
    }
    // 10× purchase graph from the stress suite's replicated
    // orders/lineitem (key strides keep the ten families disjoint, so
    // edges and nodes are exactly 10×)
    val li = spark.read.parquet(s"$stressRoot/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
    val ord = spark.read.parquet(s"$stressRoot/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("cust_node"),
        (col("l_suppkey") * 2 + 1).as("supp_node"))
      .agg(count(lit(1)).cast("double").as("weight"))
    val edges10 = pairs.select(col("cust_node").as("src"),
        col("supp_node").as("dst"), col("weight"))
      .unionByName(pairs.select(col("supp_node").as("src"),
        col("cust_node").as("dst"), col("weight")))
      .localCheckpoint(true)
    println(s"PROBE edges10=${edges10.count()}")
    timed("pagerank_10x") {
      Graph.pageRank(edges10, damping = 0.85, iters = 15).count()
    }
    spark.stop()
  }
}
