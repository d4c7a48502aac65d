package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Ad-hoc stage profiler for the heavy catalog queries — same-JVM,
  * alternating A/B of single-partition vs rebalanced pipelines so host
  * load noise hits both sides equally. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
    val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val embRaw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def sigsOf(d: DataFrame) = Dedup.minhashSignatures(d, 3, 192)
    def hllOf(d: DataFrame) = d.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("ad"))
    def srpOf(d: DataFrame) = Similarity.srpBuckets(
      Similarity.plantedDupCorpus(d.select("vec_id", "embedding"), 1000000L)
        .withColumn("nrm", Similarity.l2norm(col("emb"))), 12, 16, 64)
    val d32 = docsRaw.repartition(32)
    val hsDF = d32.select(col("doc_id"),
      TextAnalysis.shingleHashArray(TextAnalysis.tokensFast(col("text")), 3).as("hs"))
      .persist()
    hsDF.count()
    (1 to 3).foreach { i =>
      time(s"sigs #$i")(noop(sigsOf(d32)))
      time(s"bands #$i")(noop(Dedup.bands(sigsOf(d32), 64, 3)))
      time(s"candidates #$i")(noop(
        Dedup.candidatePairs(Dedup.bands(sigsOf(d32), 64, 3))))
      spark.catalog.clearCache()
      val cand = Dedup.candidatePairs(Dedup.bands(sigsOf(d32), 64, 3)).persist()
      time(s"cand.count #$i")(println(s"[profile]   -> ${cand.count()} pairs"))
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val shCand = TextAnalysis.shinglesRaw(
        d32.join(broadcast(candDocs), Seq("doc_id")), 3).distinct().persist()
      time(s"shCand.count #$i")(println(s"[profile]   -> ${shCand.count()} shingle rows"))
      time(s"verify #$i")(noop(Dedup.verifyJaccard(cand, shCand)
        .filter(col("jaccard") >= 0.7).orderBy("doc_a", "doc_b")))
    }
    spark.stop()
  }
}
