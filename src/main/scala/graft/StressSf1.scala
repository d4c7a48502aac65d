package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DupClusters}
import graft.sources.Tables

/** 10× stress run for the dedup/similarity family (q17 MinHash-LSH, q22
  * SimHash, q28 prefix-filter Jaccard, q40 connected components) — the
  * scale check sf0.1 cannot show: candidate volume must grow LINEARLY in
  * corpus size, or a bucket-skew blowup is hiding in the LSH/prefix
  * shapes.
  *
  * Corpus: 10 copies of the sf0.1 `documents` table under remapped ids.
  * Copy 0 is verbatim; copy k > 0 suffixes EVERY token with `~k`, so no
  * shingle is shared across copy families — the 10× corpus behaves like
  * 10× more distinct documents (a verbatim union would instead plant a
  * 10-clique of exact duplicates on every doc: quadratic pair blowup by
  * construction, measuring the fixture, not the operator). Each family
  * reproduces the original corpus's internal near-dup structure, so the
  * TRUE pair count is exactly 10× the sf0.1 count — which makes output
  * rows a built-in linearity check alongside wall time.
  *
  * Timing: one warm-up-free timed pass per (query, tier), same session,
  * sf0.1 first (the comparison baseline). The action is `count()`, not
  * the bench's noop write — the row counts ARE part of the artifact, and
  * the final orderBy a count elides is noise at pair-output sizes. Gate:
  * no query's sf1 time exceeds 10× its sf0.1 time (linear-or-better),
  * and each pair count is exactly 10× its sf0.1 twin.
  *
  * Writes `target/stress_sf1.json`; the tracked copy (STRESS_SF1.json)
  * is promoted explicitly after checking loadavg telemetry, like the
  * refscale artifacts.
  */
object StressSf1 {

  private val Copies = 10
  // divisible by 3 so q70's doc_id%3 corpus/batch split lands identically
  // in every copy family — each family then reproduces the base split and
  // the cross-match count stays exactly 10x (a stride ≡ 1 mod 3 would
  // rotate the split per family and break the linearity contract)
  private val IdStride = 9999999L

  private def buildCorpus(spark: org.apache.spark.sql.SparkSession,
      base: DataFrame, path: String): Unit = {
    val corpus = (0 until Copies).map { k =>
      if (k == 0) base
      else base.select(
        (col("doc_id") + lit(k * IdStride)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$k"))), " ").as("text"))
    }.reduce(_ unionByName _)
    // spread across the session's cores so the scan side of every stress
    // query starts parallel (the sf tables are single-row-group files)
    corpus.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(path)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stress-sf1")
    val sfDir = "/root/testdata/sf0.1"
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    // stride-keyed: a stride change must invalidate the cached corpus
    val stressPath = s"target/stress_sf1_s$IdStride/documents.parquet"
    if (!Files.exists(Paths.get(stressPath, "_SUCCESS")))
      buildCorpus(spark, base, stressPath)
    val stress = spark.read.parquet(stressPath)

    val pipelines: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q17_dedup_minhash" -> (d => Dedup.nearDuplicates(d, n = 3, k = 192, b = 64, r = 3, threshold = 0.7)),
      "q22_simhash" -> (d => Dedup.simhashNearDups(d, maxDist = 3)),
      "q28_jaccard_join" -> (d => Dedup.jaccardJoin(d, n = 3, tau = 0.7)),
      "q40_dup_clusters" -> (d => DupClusters.connectedComponents(
        Dedup.jaccardJoin(d, n = 3, tau = 0.7)
          .select(col("doc_a").as("u"), col("doc_b").as("v")))),
      // span rows replicate per copy family (cross-family grams can't
      // collide — every token differs), so sf1_rows = 10 x sf0.1_rows
      // exactly, same linearity contract as the set-based detectors
      "q64_span_dedup" -> (d => Dedup.spanDedup(d, n = 20)),
      // cross-corpus: same %3 split per family (IdStride % 3 == 0), so
      // matches replicate per family -> rows exactly 10x
      "q70_cross_dedup" -> (d => Dedup.crossJaccardMatches(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
        n = 3, tau = 0.7)),
      // map-only explode: token counts are family-invariant (the ~k
      // suffix never adds tokens), so chunk rows are exactly 10x
      "q65_chunk_overlap" -> (d => operators.Shards.chunkOverlap(d, 64, 48)),
      // the streaming gate's one-sided prefix filter (probe = FULL hash
      // set) trades candidate volume for statelessness — this is the
      // check that the trade stays LINEAR at 10x: same %3 split per
      // family, so matches are exactly 10x, like q70; index build +
      // probe both inside the timed window
      "ingest_gate_batch" -> (d => {
        val idx = streaming.IngestGateStream.buildIndex(
          d.filter(col("doc_id") % 3 =!= 0), n = 3, tau = 0.7)
        streaming.IngestGateStream.matches(idx,
          d.filter(col("doc_id") % 3 === 0)
            .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))),
          n = 3, tau = 0.7, "ts")
      }))

    val loadStart = Bench.loadavgJson()
    val results = pipelines.map { case (name, build) =>
      def timed(d: DataFrame): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = build(d).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (s01, rows01) = timed(base)
      val (s1, rows1) = timed(stress)
      println(f"[stress] $name%-18s sf0.1 $s01%6.1f s / $rows01%,d rows -> " +
        f"sf1 $s1%6.1f s / $rows1%,d rows  (time x${s1 / s01}%.1f, rows x${rows1.toDouble / math.max(rows01, 1)}%.1f)")
      (name, s01, rows01, s1, rows1)
    }
    val json = results.map { case (name, s01, rows01, s1, rows1) =>
      s""""$name":{"sf0.1_sec":$s01,"sf0.1_rows":$rows01,"sf1_sec":$s1,"sf1_rows":$rows1,"time_ratio":${s1 / s01}}"""
    }.mkString("{", ",", "}")
    val out =
      s"""{"metric":"stress_sf1","copies":$Copies,"queries":$json,"loadavg_start":$loadStart,"loadavg_end":${Bench.loadavgJson()}}"""
    Files.writeString(Paths.get("target/stress_sf1.json"), out + "\n")
    spark.stop()
    println(out)
  }
}
