package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Shards, TextAnalysis, TrainingPipeline}
import graft.sources.Tables

/** End-to-end training-data pipeline CLI — the library's operators run
  * as ONE production-shaped job instead of isolated catalog entries:
  *
  * {{{
  *   runMain graft.PipelineMain <sfDir> <outDir> [shardTokens]
  * }}}
  *
  *   1. '''exact dedup''' — smallest doc_id survives per normalized
  *      SHA-256 content hash (q16's contract);
  *   2. '''near-dup clusters + survivor election''' — prefix-filter
  *      Jaccard pairs (q28) → connected components (q40) → keep the
  *      longest doc per cluster (q72); the pair frame is built ONCE and
  *      feeds clustering directly through the q40 seam;
  *   3. '''per-language length gate''' — drop docs below their own
  *      language's p10 char count (q73's per-group threshold);
  *   4. '''shard layout''' — token-budget shards in doc_id order via the
  *      distributed prefix sum, written one file per shard (q41's
  *      writer), plus the per-shard manifest;
  *   5. '''data card''' — per-language doc/token accounting of the final
  *      corpus, the summary a dataset release ships.
  *
  * Outputs under `<outDir>`: `shards/` (one parquet file per shard,
  * partitioned by shard_id), `manifest/` (per-shard doc/token totals),
  * `datacard/` (per-language stats), and one JSON summary line on
  * stdout (stage row counts — parse the LAST line).
  *
  * Scale shape: every stage is a previously-verified catalog operator;
  * the only corpus-wide exchanges are the digest aggregate, the
  * prefix-filter machinery, and the shard writer's one repartition —
  * exactly the exchanges the per-operator scaladocs justify at 100 TB. */
object PipelineMain {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: PipelineMain <sfDir> <outDir> [shardTokens]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    val shardTokens = if (args.length > 2) args(2).toLong else 2048L
    val spark: SparkSession = GraftSession.local("graft-pipeline")
    val t0 = System.nanoTime()

    val docs = Tables.documents(spark, sfDir)

    // 1-3. exact dedup -> near-dup election -> p10 length gate, each
    // stage a fingerprinted _SUCCESS-gated parquet materialization
    // (round-8: replaces the eager MEMORY_AND_DISK persist+count
    // barriers — at corpus scale a whole-corpus cache evicts and
    // recomputes under pressure, while a parquet stage is written once
    // per source fingerprint and every consumer below reads a plain
    // pruned scan; a re-run with unchanged inputs rebuilds nothing).
    // Stage semantics are unchanged and shared with the oracle-gated
    // q76 catalog entry.
    val (afterExact, afterNear, corpus) =
      TrainingPipeline.stagedCuration(spark, sfDir, p = 0.10)
    // summary counts are footer-bounded parquet count(*) jobs over the
    // materialized stages (no data columns read), not corpus scans
    val total = docs.count()
    val nExact = afterExact.count()
    val nNear = afterNear.count()
    val nKept = corpus.count()

    // 4. shard layout + manifest
    Shards.writeShards(corpus, shardTokens, s"$outDir/shards")
    val manifest = Shards.shardManifest(corpus, shardTokens)
    manifest.orderBy("shard_id")
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    val nShards = spark.read.parquet(s"$outDir/manifest").count()

    // 5. data card: per-language accounting of the released corpus
    corpus
      .select(col("lang"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("lang")
      .write.mode("overwrite").parquet(s"$outDir/datacard")

    val secs = (System.nanoTime() - t0) / 1e9
    val summary =
      s"""{"metric":"pipeline","input_docs":$total,"after_exact_dedup":$nExact,""" +
        s""""after_near_dedup":$nNear,"after_quality_gate":$nKept,""" +
        s""""shards":$nShards,"shard_tokens":$shardTokens,"sec":$secs}"""
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "summary.json"), summary + "\n")
    println(summary)
    spark.stop()
  }
}
