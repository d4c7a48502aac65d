package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DupClusters, TextAnalysis}
import graft.sources.Tables

/** Ad-hoc stage profiler for the heaviest dedup pipeline (q17): times
  * each sub-stage in isolation so optimization effort lands where the
  * time is. The cache is cleared BETWEEN whole measurements, never
  * inside one — a mid-pipeline clear would silently unpersist the
  * operator's own barrier frames and re-attribute upstream cost to
  * downstream stages. */
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

    val docs = Tables.documents(spark, sfDir)
    def sigs = Dedup.minhashSignatures(Tables.rebalanced(docs), 3, 192)
    // q40 split: how much of the operator is the q28 pair build vs the
    // connected-components loop itself (opt-in, skips the q17 stages)
    if (sys.env.contains("SPARK_GRAFT_PROFILE_Q40")) {
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val pairs = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
          .select(col("doc_a").as("u"), col("doc_b").as("v")).persist()
        pairs.count()
        println(f"[profile] q40 pairs #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val t1 = System.nanoTime()
        noop(DupClusters.connectedComponents(pairs).orderBy("doc_id"))
        println(f"[profile] q40 cc #$i: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
      spark.stop()
      return
    }
    (1 to 3).foreach { i =>
      time(s"q17 signatures #$i")(noop(sigs))
      time(s"q17 bands #$i")(noop(Dedup.bands(sigs, 64, 3)))
      time(s"q17 candidates #$i")(noop(Dedup.candidatePairs(Dedup.bands(sigs, 64, 3))))
      time(s"q17 full #$i")(noop(
        Dedup.nearDuplicates(docs, n = 3, k = 192, b = 64, r = 3, threshold = 0.7)))
      time(s"q28 full #$i")(noop(Dedup.jaccardJoin(docs, n = 3, tau = 0.7)))
    }
    spark.stop()
  }
}
