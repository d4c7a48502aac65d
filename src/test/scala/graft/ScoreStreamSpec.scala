package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Logit
import graft.streaming.ScoreStream

/** Streaming deployment of the trained curation gate (the q132 model
  * frozen at ingest time).
  *
  * Gates: (1) the streamed scores equal the batch projection row for
  * row under the same frozen weights — across multiple micro-batches,
  * so batch boundaries cannot perturb a per-row map; (2) the query is
  * provably STATELESS (zero state operators in progress telemetry) —
  * the property that makes the gate wire-speed and trivially
  * recoverable; (3) the frozen weights are the offline-trained ones,
  * so the chain from deterministic IRLS to ingest scoring is closed.
  */
class ScoreStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed gate scores equal the batch projection row for row, " +
    "statelessly, across micro-batch boundaries") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val weights = Logit.train(Logit.features(spark, sf))

    val rows = docs.as[(Long, String)].collect().toSeq
    val (first, second) = rows.splitAt(rows.length / 2)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = ScoreStream.scored(
        stream.toDF().toDF("doc_id", "text"), weights)
      .writeStream.format("memory").queryName("score_stream")
      .outputMode("append").start()
    try {
      stream.addData(first)
      query.processAllAvailable()
      stream.addData(second)
      query.processAllAvailable()
      // stateless: no state store operator ever materializes
      assert(query.lastProgress.stateOperators.isEmpty,
        s"expected a stateless plan: ${query.lastProgress}")
    } finally query.stop()

    val streamed = spark.table("score_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    val batch = Logit.scoreWith(Logit.featuresOf(docs), weights).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
