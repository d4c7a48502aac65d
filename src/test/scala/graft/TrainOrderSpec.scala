package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainOrder
import graft.sources.Tables

/** q81 global training order: exactness vs the naive one-window
  * formulation, partition-count stability, epoch re-keying, and the
  * no-global-data-window plan guard. */
class TrainOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("train order matches the single-window brute force and is partition-count-stable") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val got = TrainOrder.trainOrder(docs, col("doc_id"), epoch = 1)
    // brute force: one global (single-task) window — test-only reference
    val brute = docs
      .withColumn("train_pos",
        row_number().over(Window.orderBy(
          TrainOrder.shuffleKey(col("doc_id"), 1), col("doc_id"))).cast("long") - 1)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    // same assignment when the source arrives pre-shuffled differently
    val got2 = TrainOrder.trainOrder(
      docs.repartition(7, col("doc_id")), col("doc_id"), epoch = 1)
    assert(got2.exceptAll(brute).isEmpty)
  }

  test("positions are contiguous 0..N-1 and epochs permute them") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val e1 = TrainOrder.trainOrder(docs, col("doc_id"), epoch = 1)
      .select("doc_id", "train_pos").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toMap
    val e2 = TrainOrder.trainOrder(docs, col("doc_id"), epoch = 2)
      .select("doc_id", "train_pos").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toMap
    val n = e1.size
    assert(e1.values.toSeq.sorted === (0L until n).toSeq)
    assert(e2.values.toSeq.sorted === (0L until n).toSeq)
    // a fresh epoch is a genuinely different permutation of the same docs
    assert(e1.keySet === e2.keySet)
    assert(e1.count { case (d, p) => e2(d) != p } > n / 2,
      "epoch re-key left most positions unchanged — epochs are not reshuffling")
  }

  test("no data-scale window runs without a partition spec") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.ReusedSubqueryExec
    val docs = Tables.documents(spark, sf).select("doc_id")
    val out = TrainOrder.trainOrder(docs, col("doc_id"), epoch = 1)
    out.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val expanded = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ expanded ++ p.subqueries.map {
        case r: ReusedSubqueryExec => r.child
        case s => s
      }).flatMap(allNodes)
    }
    val ws = allNodes(out.queryExecution.executedPlan).collect { case w: WindowExec => w }
    assert(ws.nonEmpty, "expected window nodes in the prefix-sum plan")
    ws.foreach { w =>
      // the only unpartitioned window allowed is the exclusive prefix
      // over the per-partition totals — P rows, P = partition count,
      // bounded by cluster width at any data size
      val overPartitionTotals =
        w.orderSpec.exists(_.child.references.exists(_.name == "__pid"))
      assert(w.partitionSpec.nonEmpty || overPartitionTotals,
        s"global window over row-scale data:\n$w")
    }
  }
}
