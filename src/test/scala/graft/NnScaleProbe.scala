package graft

import org.apache.spark.sql.functions._

import graft.operators.{NnDescent, Similarity}
import graft.sources.Tables

/** Ad-hoc scaling probe for the NN-descent build/append rows — NOT part
  * of the test suite (run via `Test/runMain graft.NnScaleProbe`). Times
  * q146 (build) and q148 (append) at the sf0.1 tier and the 10× stress
  * tier (reusing the stress suite's staged 10× embeddings), and reports
  * build recall@5 vs exact at both tiers — the same-day A/B evidence the
  * r15 verdict asked for when adjudicating the superlinear rows
  * (BENCH_NOTES.md records the before/after pairs). */
object NnScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-nn-scale-probe")
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .localCheckpoint(true)
    val stressPath = "target/stress_sf1_s9999999_v4/embeddings.parquet"
    val embStress = spark.read.parquet(stressPath).localCheckpoint(true)
    println(s"PROBE n_base=${embBase.count()} n_stress=${embStress.count()}")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def recallAt(g: org.apache.spark.sql.DataFrame,
        emb: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val exact = pairs(Similarity.knnBrute(emb, 100, 5))
      val got = pairs(NnDescent.knnGraphQueriesOf(g, 100, 5))
      val rec = exact.keys.toSeq
        .map(q => (got.getOrElse(q, Set.empty[Long]) & exact(q)).size).sum
        .toDouble / exact.values.map(_.size).sum
      println(f"PROBE $tag%-14s recall@5 $rec%.3f")
    }

    // q146: scratch build at both tiers (count() forces the plan; the
    // build already checkpoints internally every round)
    val g1 = timed("build_1x") {
      val g = NnDescent.build(embBase).localCheckpoint(true)
      g.count(); g
    }
    recallAt(g1, embBase, "build_1x")
    val g10 = timed("build_10x") {
      val g = NnDescent.build(embStress).localCheckpoint(true)
      g.count(); g
    }
    recallAt(g10, embStress, "build_10x")

    // q148: append — base graphs prebuilt untimed (the stress-suite
    // convention: the row measures the INSERT)
    val base1 = NnDescent.build(embBase.filter(col("vec_id") % 10 =!= 0))
      .localCheckpoint(true)
    base1.count()
    val base10 = NnDescent.build(embStress.filter(col("vec_id") % 10 =!= 0))
      .localCheckpoint(true)
    base10.count()
    timed("append_1x") {
      NnDescent.appendToGraph(embBase, base1,
        col("vec_id") % 10 === 0).count()
    }
    timed("append_10x") {
      NnDescent.appendToGraph(embStress, base10,
        col("vec_id") % 10 === 0).count()
    }
    spark.stop()
  }
}
