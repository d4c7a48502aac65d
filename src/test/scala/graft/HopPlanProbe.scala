package graft

import org.apache.spark.sql.functions._

import graft.operators.NnDescent

/** One-off plan probe: replicate a single batchBeam hop (frontier ⋈
  * staged edges → per-query props aggregate → state join-back) and
  * print its physical plan, so the per-hop join strategy — hidden
  * behind the per-hop localCheckpoint in the full entry plan — is
  * readable. Test scope, measurement only. */
object HopPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-hopplan")
    val root = NnDescent.graphIndexStaged(spark, sfDir)
    val edges = spark.read.parquet(s"$root/edges")
    val vecs = spark.read.parquet(s"$root/vecs")
    val nb = lit(NnDescent.NodeBuckets)
    // state as batchBeam holds it: one checkpointed row per query
    val state = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"),
        slice(transform(sequence(lit(0L), lit(15L)), x => x), 1, 16).as("frontier"),
        array(col("vec_id")).as("visited"))
      .localCheckpoint(false)
    val edgesN = edges.select(col("nbucket"), col("src").as("node"),
      col("dst"), col("d_emb"), col("d_nrm"), col("d_lab"))
    val fr = state.select(col("query_id"), col("q_emb"), col("q_nrm"),
        explode(col("frontier")).as("node"))
      .withColumn("nbucket", pmod(col("node"), nb).cast("int"))
    val cand = fr.join(edgesN, Seq("nbucket", "node"))
      .withColumn("node", col("dst"))
    val props = cand
      .select(col("query_id"), struct(lit(0.0).as("ns"), col("node")).as("p"))
      .groupBy("query_id").agg(collect_list(col("p")).as("props"))
    val next = state.join(props, Seq("query_id"), "left")
    println("===== one hop (join + props agg + state join-back) =====")
    next.explain("formatted")
    spark.stop()
  }
}
