package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Partitioned, TextAnalysis}
import graft.sources.Tables

/** Partition pruning must (a) change nothing semantically and (b)
  * actually skip the other languages' directories — (b) is asserted on
  * the executed scan, not assumed. */
class PartitionedSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pruned stats equal the same stats over the unpartitioned table") {
    val got = Partitioned.prunedLangStats(spark, sf, "en")
      .orderBy("source").collect()
    val plain = Tables.documents(spark, sf)
      .filter(col("lang") === "en")
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("source").collect()
    assert(got.map(_.toString).toSeq === plain.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }

  test("the lang filter prunes partitions in the executed scan") {
    val df = Partitioned.prunedLangStats(spark, sf, "en")
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    val nLangs = Tables.documents(spark, sf)
      .select("lang").distinct().count()
    // selectedPartitions is lazy-val'd on the scan; partition pruning must
    // have cut the read set to exactly one of the lang directories
    assert(scan.relation.partitionSchema.fieldNames.contains("lang"))
    assert(scan.metadata("PartitionFilters").contains("lang"),
      s"expected a lang partition filter, got: ${scan.metadata}")
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 pruned partition of $nLangs, got ${scan.selectedPartitions.partitionCount}")
    assert(nLangs > 1)
  }
}
