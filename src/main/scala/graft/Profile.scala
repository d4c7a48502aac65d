package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Ad-hoc stage profiler for the heavy catalog queries — times each
  * sub-pipeline of q17/q27 in isolation (noop sink, cache cleared
  * between stages) so optimization effort lands where the time is. */
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

    // ---- q17 sub-stages ----
    val docs = Tables.documents(spark, sfDir)
    val exploded = TextAnalysis.shinglesRaw(docs, 3)
    time("q17 shingle explode only")(noop(exploded))
    time("q17 h0 only")(noop(exploded.select(col("doc_id"), xxhash64(col("shingle")).as("h0"))))
    val sigs = Dedup.minhashSignatures(exploded, 192)
    time("q17 signatures (192 mins)")(noop(sigs))
    time("q17 bands")(noop(Dedup.bands(sigs, 64, 3)))
    time("q17 candidates")(noop(Dedup.candidatePairs(Dedup.bands(sigs, 64, 3))))
    time("q17 full")(noop(SparkEntry.queries("q17_dedup_minhash")(spark, sfDir)))

    // ---- q17 lazy-persist variant (no materialization barrier) ----
    def lazyVariant(): DataFrame = {
      val cand = Dedup.candidatePairs(Dedup.bands(Dedup.minhashSignatures(exploded, 192), 64, 3)).persist()
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val shCand = exploded.join(broadcast(candDocs), Seq("doc_id")).distinct().persist()
      Dedup.verifyJaccard(cand, shCand).filter(col("jaccard") >= 0.7).orderBy("doc_a", "doc_b")
    }
    (1 to 3).foreach { i => time(s"q17 lazy persists #$i")(noop(lazyVariant())) }
    (1 to 3).foreach { i =>
      time(s"q17 eager counts #$i")(noop(SparkEntry.queries("q17_dedup_minhash")(spark, sfDir)))
    }

    // ---- q27 sub-stages ----
    val corpus = Similarity.plantedDupCorpus(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"), 1000000L)
    val e = corpus.withColumn("nrm", Similarity.l2norm(col("emb")))
    time("q27 corpus+norm")(noop(e))
    val buckets = Similarity.srpBuckets(e, 12, 16, 64)
    time("q27 srp buckets (192 plane dots)")(noop(buckets))
    time("q27 full")(noop(SparkEntry.queries("q27_embed_neardup_lsh")(spark, sfDir)))
    spark.stop()
  }
}
