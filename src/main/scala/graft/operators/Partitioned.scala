package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Hive-style partitioned layout — the OTHER half of data-layout design
  * next to bucketing (X43): write once partitioned by a low-cardinality
  * filter column, and every query filtering on it prunes whole
  * directories at PLANNING time. At 100 TB, `lang=en/` pruning is the
  * difference between scanning the full corpus and scanning the
  * slice — before a single row is read, independent of file statistics.
  *
  * The write side repartitions by the partition column first, so each
  * output directory receives one file per shuffle partition that holds
  * the value instead of one file per upstream task — the
  * small-files-explosion guard every production layout applies.
  *
  * Creation is idempotent per catalog (same economics as [[Bucketed]]):
  * one write amortized over every pruned read. The pruning itself is
  * asserted on the executed plan in ScalaTest, not assumed.
  */
object Partitioned {
  import Bucketed.md5hex

  /** Idempotently materialize `dir/name.parquet` as a table partitioned
    * by `partCol`; returns the table name. */
  def partitionedTable(spark: SparkSession, dir: String, name: String,
      partCol: String): String = synchronized {
    val id = s"graft_${name}_p${md5hex(s"$dir/$partCol").take(8)}"
    if (!spark.catalog.tableExists(id)) {
      Tables.load(spark, dir, name)
        .repartition(col(partCol))
        .write
        .partitionBy(partCol)
        .option("path", s"target/partitioned/$id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(id)
    }
    id
  }

  /** Per-source token totals for ONE language, read from the
    * lang-partitioned documents table: the `lang = ...` predicate prunes
    * every other language's directories at planning time. */
  def prunedLangStats(spark: SparkSession, dir: String, lang: String): DataFrame = {
    val t = partitionedTable(spark, dir, "documents", "lang")
    spark.table(t)
      .filter(col("lang") === lang)
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q60_partition_pruning",
      "Partition-pruned scan: documents materialized once partitioned by " +
        "lang (write repartitions by the partition column first — one file " +
        "per value, not one per upstream task), then per-source token stats " +
        "for lang='en' read ONLY the en/ directory — directory-level pruning " +
        "at planning time, before any row or file statistic is touched. " +
        "ScalaTest asserts the executed scan's partition count; the oracle " +
        "is the same stats over the unpartitioned table.",
      (s, dir) =>
        prunedLangStats(s, dir, "en").orderBy("source"),
      Some("""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS BIGINT) AS n_tokens
        FROM documents
        WHERE lang = 'en'
        GROUP BY source
        ORDER BY source"""))
  )
}
