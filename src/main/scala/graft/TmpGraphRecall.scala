package graft

/** Throwaway round-14 iteration harness: graph-family recall at the
  * tracked sf0.1 point, without the full Recall frontier sweep. */
object TmpGraphRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-tmp-recall")
    def pairs(name: String): Map[Long, Set[Long]] = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val p = SparkEntry.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      println(f"[tmp] $name ran in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      p
    }
    val brute = pairs("q19_knn_brute")
    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val per = brute.map { case (q, t) =>
        (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      per.sum / per.size
    }
    Seq("q147_knn_graph_search", "q151_knn_graph_batch",
        "q152_knn_graph_hier", "q154_knn_graph_hier_batch",
        "q155_knn_graph_hier_append").foreach { n =>
      println(f"[tmp] $n recall@5 = ${recallOf(pairs(n))}%.3f")
    }
    // q156 vs the FILTERED brute
    val embT = graft.sources.Tables.embeddings(spark, sfDir)
    val fexact = operators.Similarity.knnBruteFiltered(embT, 100, 5, 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fgot = pairs("q156_knn_filtered")
    val fr = fexact.map { case (q, t) =>
      (fgot.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
    println(f"[tmp] q156_knn_filtered recall@5 = ${fr.sum / fr.size}%.3f (filtered brute)")
    spark.stop()
  }
}
