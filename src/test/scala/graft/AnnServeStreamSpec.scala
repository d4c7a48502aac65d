package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphServe
import graft.streaming.AnnServeStream
import graft.sources.Tables

/** Streaming ANN serving (the online half of the vector store).
  *
  * Gates: (1) the streamed answers equal the q151 batch answers row
  * for row — across MULTIPLE micro-batches, so batch boundaries
  * cannot perturb a per-query traversal (identity is structural:
  * same staged index, same per-query entry hash, same machinery —
  * and still proven by observation here); (2) replaying a batch
  * returns identical rows (exactly-once by determinism); (3) an
  * empty micro-batch never reaches the sink. */
class AnnServeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed ANN serving equals the batch answer row for row " +
    "across micro-batch boundaries, and replays are identical") {
    import spark.implicits._
    val queryRows = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    assert(queryRows.size === 10)
    val (first, second) = queryRows.splitAt(4)

    val buf = ArrayBuffer.empty[(Long, Long, Int, Double)]
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val query = AnnServeStream.serve(spark,
        stream.toDF().toDF("query_id", "embedding"), sf, k = 5) {
      (res, _) =>
        buf.synchronized {
          buf ++= res.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
              r.getDouble(3)))
        }
    }
    try {
      stream.addData(first)
      query.processAllAvailable()
      stream.addData(second)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = buf.sortBy(t => (t._1, t._3)).toSeq
    val batch = GraphServe.graphSearchBatch(spark, sf, nQueries = 10, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(streamed === batch,
      "the online serving path diverged from the offline batch answer")
    assert(streamed.nonEmpty)

    // replay: serving the same queries again yields identical rows
    val replay = ArrayBuffer.empty[(Long, Long, Int, Double)]
    val stream2 = MemoryStream[(Long, Seq[Float])]
    val q2 = AnnServeStream.serve(spark,
        stream2.toDF().toDF("query_id", "embedding"), sf, k = 5) {
      (res, _) =>
        replay.synchronized {
          replay ++= res.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
              r.getDouble(3)))
        }
    }
    try {
      stream2.addData(queryRows)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(replay.sortBy(t => (t._1, t._3)).toSeq === streamed)
  }
}
