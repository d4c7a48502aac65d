package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Persistent bucketing — the shuffle-elimination pattern for joins that
  * RECUR: pay one hash-partitioned write per table, and every subsequent
  * join/aggregate on the bucket key is exchange-free because the SCAN
  * itself reports `HashPartitioning(key, nBuckets)` to the planner.
  *
  * At 100 TB this is the difference between re-shuffling both join sides
  * on every pipeline run and reading co-located buckets: a fact table
  * joined nightly against its orders amortizes ONE bucketed write across
  * every downstream join, aggregate, and dedup keyed on the same column.
  * (One-shot joins should NOT bucket — the write is itself a shuffle;
  * the pattern pays off strictly with reuse.)
  *
  * Bucket-table writes land under `target/bucketed/` (external-path
  * tables in the session catalog), keyed by the source directory so
  * different scale factors coexist; creation is idempotent per
  * catalog — repeat calls (e.g. bench iterations) reuse the existing
  * table, which is exactly the amortization the pattern models.
  */
object Bucketed {

  /** MD5 hex of a table-id discriminator string — shared by the
    * idempotent-layout operators ([[Bucketed]], [[Partitioned]]) so
    * different source dirs / layout params yield distinct table ids. */
  private[graft] def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Idempotently materialize `dir/name.parquet` as a persistent table
    * bucketed (and sorted) by `key` into `nBuckets`; returns the table
    * name. Safe across JVMs: an on-disk leftover from a previous run is
    * overwritten the first time the table is (re)created in a fresh
    * catalog. */
  def bucketedTable(spark: SparkSession, dir: String, name: String,
      key: String, nBuckets: Int): String = synchronized {
    val id = s"graft_${name}_${md5hex(s"$dir/$nBuckets/$key").take(8)}"
    if (!spark.catalog.tableExists(id)) {
      Tables.load(spark, dir, name).write
        .bucketBy(nBuckets, key).sortBy(key)
        .option("path", s"target/bucketed/$id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(id)
    }
    id
  }

  /** lineitem ⋈ orders on the order key with BOTH sides bucketed: the
    * join and the following group-by run with zero hash exchanges. */
  def bucketedOrderJoin(spark: SparkSession, dir: String, nBuckets: Int): DataFrame = {
    val li = spark.table(bucketedTable(spark, dir, "lineitem", "l_orderkey", nBuckets))
    val ord = spark.table(bucketedTable(spark, dir, "orders", "o_orderkey", nBuckets))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q51_bucketed_join",
      "Co-located join via persistent bucketing: lineitem and orders are " +
        "materialized once as 16-bucket hash-partitioned tables on the order " +
        "key, so the scan itself reports HashPartitioning and the join PLUS " +
        "the per-order aggregate run with zero hash exchanges (the only " +
        "shuffle in the plan is the final presentation sort). The amortize-" +
        "one-write-across-recurring-joins pattern; creation is idempotent, so " +
        "bench iterations after the first measure the exchange-free join " +
        "itself. Oracle: the plain join/aggregate.",
      (s, dir) =>
        bucketedOrderJoin(s, dir, nBuckets = 16)
          .orderBy("l_orderkey", "o_orderpriority"),
      Some("""
        SELECT l_orderkey, o_orderpriority, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY l_orderkey, o_orderpriority"""))
  )
}
