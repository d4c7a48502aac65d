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

    // 1. exact dedup: deterministic smallest-id survivor per digest. The
    // summary's input count AND survivor count ride in ONE aggregate over
    // the digest groups (sum of group sizes = input docs; group count =
    // survivors, since the min-doc_id join keeps exactly one row per
    // group) — no separate corpus scan, and no extra count() job over
    // the joined frame.
    val exactAgg = docs
      .withColumn("__h", sha2(TextAnalysis.norm(col("text")), 256))
      .groupBy("__h").agg(min("doc_id").as("doc_id"), count(lit(1)).as("__n"))
      .persist()
    val afterExact = docs.join(exactAgg.select("doc_id"), Seq("doc_id")).persist()
    val exactStats = exactAgg.agg(count(lit(1)), sum("__n")).head()
    val (nExact, total) = (exactStats.getLong(0), exactStats.getLong(1))

    // 2. near-dup clusters + election: drop every non-canonical member
    // (shared stage code with the oracle-gated q76 catalog entry)
    val afterNear = afterExact
      .join(TrainingPipeline.nearDupDropped(afterExact), Seq("doc_id"), "left_anti")
      .persist()
    val nNear = afterNear.count()
    // exactAgg's cache must survive until afterNear.count() above has
    // materialized afterExact — releasing it right after the stats
    // aggregate would recompute the full-corpus digest groupBy when the
    // join first runs (the exact double-scan stage 1 exists to avoid)
    exactAgg.unpersist()
    afterExact.unpersist()

    // 3. per-language length gate at p10 (q76 stage 3)
    val corpus = TrainingPipeline.lengthGated(afterNear, p = 0.10).persist()
    val nKept = corpus.count()
    afterNear.unpersist()

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
    corpus.unpersist()

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
