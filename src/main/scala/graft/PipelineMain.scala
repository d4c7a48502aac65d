package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DupClusters, Sampling, Shards, TextAnalysis, TrainingPipeline}
import graft.sources.Tables

/** End-to-end training-data pipeline CLI — the library's operators run
  * as ONE production-shaped job instead of isolated catalog entries:
  *
  * {{{
  *   runMain graft.PipelineMain <sfDir> <outDir> [shardTokens] \
  *     [--segment-dedup] [--leakage-split] [--bpe]
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
  *   4. '''[opt-in] segment dedup''' (`--segment-dedup`) — C4-style
  *      10-token segment dedup with reassembly (q97): repeated
  *      boilerplate is stripped from surviving documents and their text
  *      REPLACED by the reassembled survivor text before layout; docs
  *      whose every segment was seen elsewhere are dropped;
  *   5. '''[opt-in] leakage-safe split''' (`--leakage-split`) — the q98
  *      cluster-keyed 80/10/10 assignment, clustered at tau=0.5: the
  *      dedup stages already removed ≥0.7 twins, so the split guards
  *      the 0.5–0.7 GRAY ZONE — pairs too dissimilar to drop but
  *      similar enough to leak eval signal across splits — written as
  *      `splits/` (doc_id, cluster_id, split);
  *   6. '''[opt-in] BPE tokenizer + token ids''' (`--bpe`) — learn 32
  *      subword merges on the RELEASED corpus (q102, Sennrich et al.
  *      2016; training on the post-dedup corpus is the convention — a
  *      tokenizer trained on duplicates over-allocates merges to
  *      boilerplate), ship the tokenizer (`tokenizer/merges`,
  *      `tokenizer/segments`) and the encoded corpus (`token_ids/`,
  *      q103's subword-id strings);
  *   7. '''shard layout''' — token-budget shards in doc_id order via the
  *      distributed prefix sum, written one file per shard (q41's
  *      writer), plus the per-shard manifest. With `--bpe` the budget
  *      unit is the MODEL token (q105's subword counts under the
  *      just-shipped tokenizer); without, the word-level count;
  *   8. '''data card''' — per-language doc/token accounting of the final
  *      corpus, the summary a dataset release ships.
  *
  * Outputs under `<outDir>`: `shards/` (one parquet file per shard,
  * partitioned by shard_id), `manifest/` (per-shard doc/token totals),
  * `datacard/` (per-language stats), optionally `splits/`,
  * `tokenizer/` + `token_ids/`, and one JSON summary line on stdout
  * (stage row counts — parse the LAST line).
  *
  * Scale shape: every stage is a previously-verified catalog operator;
  * the only corpus-wide exchanges are the digest aggregate, the
  * prefix-filter machinery, the opt-in stages' segment/pair exchanges,
  * and the shard writer's one repartition — exactly the exchanges the
  * per-operator scaladocs justify at 100 TB. */
object PipelineMain {

  /** The pipeline body, session-agnostic so tests drive it on the shared
    * test session (main() owns session lifecycle, not this). Returns the
    * summary JSON it also writes to `<outDir>/summary.json`. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      shardTokens: Long, segmentDedup: Boolean, leakageSplit: Boolean,
      bpe: Boolean = false): String = {
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
    val (afterExact, afterNear, curated) =
      TrainingPipeline.stagedCuration(spark, sfDir, p = 0.10)
    // summary counts are footer-bounded parquet count(*) jobs over the
    // materialized stages (no data columns read), not corpus scans
    val total = docs.count()
    val nExact = afterExact.count()
    val nNear = afterNear.count()
    val nGated = curated.count()

    // 4. opt-in segment dedup: replace text with the reassembled
    // survivor text; a doc that kept nothing is dropped. The n_chars
    // column is recomputed over the kept text so the data card and any
    // downstream length consumer see the released bytes, not the
    // pre-strip ones.
    val corpus: DataFrame = if (segmentDedup) {
      val kept = Dedup.segmentDedup(curated, w = 10)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("text_kept"))
      curated.drop("text", "n_chars")
        .join(kept, Seq("doc_id"))
        .withColumn("text", col("text_kept"))
        .withColumn("n_chars", length(col("text")).cast("int"))
        .drop("text_kept")
    } else curated
    val nKept = if (segmentDedup) corpus.count() else nGated

    // 5. opt-in leakage-safe split over the RELEASED corpus, clustered
    // in the gray zone below the dedup threshold (tau=0.5 < 0.7)
    val splitCounts: Option[Map[String, Long]] = if (leakageSplit) {
      val pairs = Dedup.jaccardJoin(corpus, n = 3, tau = 0.5)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      val splits = Sampling.leakageSafeSplit(
        corpus, DupClusters.connectedComponents(pairs), 0.8, 0.1)
      splits.orderBy("doc_id")
        .write.mode("overwrite").parquet(s"$outDir/splits")
      Some(spark.read.parquet(s"$outDir/splits")
        .groupBy("split").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    } else None

    // 6. opt-in BPE tokenizer learned on the RELEASED corpus + the
    // encoded corpus: the tokenizer artifacts are the shippable output
    // (a consumer re-encodes any text under them); token_ids is the
    // training-ready emit. Differential-gated operators (BpeSpec).
    val bpeStats: Option[(Int, Long, Long)] = if (bpe) {
      // O(1)-job learning (one corpus aggregate + one collect + the
      // incremental driver loop) — a production merge budget costs the
      // same job count as these 32 merges
      val (rules, words) = operators.Bpe.learnCollected(corpus, merges = 32)
      spark.createDataFrame(rules)
        .write.mode("overwrite").parquet(s"$outDir/tokenizer/merges")
      words.write.mode("overwrite").parquet(s"$outDir/tokenizer/segments")
      val segs = spark.read.parquet(s"$outDir/tokenizer/segments")
      val ids = operators.Bpe.subwordIds(operators.Bpe.subwordVocab(segs))
      operators.Bpe.encode(corpus, segs.select("word", "syms"), ids)
        .orderBy("doc_id")
        .write.mode("overwrite").parquet(s"$outDir/token_ids")
      val nSub = spark.read.parquet(s"$outDir/token_ids")
        .agg(coalesce(sum("n_subwords"), lit(0L))).head.getLong(0)
      Some((rules.size, ids.count(), nSub))
    } else None

    // 7. shard layout + manifest. With --bpe the budget unit is the
    // MODEL token (subwords under the just-shipped tokenizer — a
    // "2048-token shard" then means 2048 tokens the training run
    // actually consumes); without a tokenizer the honest unit is the
    // word-level count (q41). Same two-pass prefix sum either way.
    if (bpe) {
      val segs = spark.read.parquet(s"$outDir/tokenizer/segments")
      operators.Bpe.writeSubwordShards(corpus, segs, shardTokens,
        s"$outDir/shards")
      operators.Bpe.subwordShardManifest(corpus, segs, shardTokens)
        .orderBy("shard_id")
        .write.mode("overwrite").parquet(s"$outDir/manifest")
    } else {
      Shards.writeShards(corpus, shardTokens, s"$outDir/shards")
      Shards.shardManifest(corpus, shardTokens).orderBy("shard_id")
        .write.mode("overwrite").parquet(s"$outDir/manifest")
    }
    val nShards = spark.read.parquet(s"$outDir/manifest").count()

    // 8. data card: per-language accounting of the released corpus,
    // plus the release notes a data card carries (Datasheets-for-
    // Datasets convention): processing provenance and the honest
    // modality statement — the engine's multimodal path ships real
    // PNG/JPEG decode but non-image codecs are deterministic stubs (a
    // sandbox constraint, stated HERE rather than only in scaladoc, per
    // the round-8 review guidance).
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "datacard_notes.json"),
      """{"modalities":"text only in this release; the library's binary/multimodal plumbing (schema, partitioning, batched executor-local decode seam) is real and tested with PNG/JPEG, while audio/video codecs are deterministic stubs pending media libraries",""" +
        """"text_processing":"whitespace-normalized lowercase; exact SHA-256 dedup; prefix-filter Jaccard near-dup election (n=3, tau=0.7); per-language p10 length gate",""" +
        s""""optional_stages":{"segment_dedup":$segmentDedup,"leakage_split":$leakageSplit,"bpe":$bpe}}""" + "\n")
    corpus
      .select(col("lang"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("lang")
      .write.mode("overwrite").parquet(s"$outDir/datacard")

    val secs = (System.nanoTime() - t0) / 1e9
    val splitJson = splitCounts
      .map(m => m.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }
        .mkString(""","splits":{""", ",", "}"))
      .getOrElse("")
    val segJson = if (segmentDedup) s""","after_segment_dedup":$nKept""" else ""
    val bpeJson = bpeStats.map { case (m, v, s) =>
      s""","bpe_merges":$m,"bpe_vocab":$v,"bpe_subword_tokens":$s""" }.getOrElse("")
    val unit = if (bpe) "subwords" else "words"
    val summary =
      s"""{"metric":"pipeline","input_docs":$total,"after_exact_dedup":$nExact,""" +
        s""""after_near_dedup":$nNear,"after_quality_gate":$nGated""" +
        segJson + splitJson + bpeJson +
        s""","shards":$nShards,"shard_tokens":$shardTokens,"shard_unit":"$unit","sec":$secs}"""
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "summary.json"), summary + "\n")
    summary
  }

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val unknown = flags.diff(Set("--segment-dedup", "--leakage-split", "--bpe"))
    val pos = args.filterNot(_.startsWith("--"))
    if (pos.length < 2 || unknown.nonEmpty) {
      if (unknown.nonEmpty)
        System.err.println(s"unknown flags: ${unknown.mkString(", ")}")
      System.err.println(
        "usage: PipelineMain <sfDir> <outDir> [shardTokens] [--segment-dedup] [--leakage-split] [--bpe]")
      sys.exit(2)
    }
    val shardTokens = if (pos.length > 2) pos(2).toLong else 2048L
    val spark: SparkSession = GraftSession.local("graft-pipeline")
    val summary = run(spark, pos(0), pos(1), shardTokens,
      segmentDedup = flags("--segment-dedup"),
      leakageSplit = flags("--leakage-split"),
      bpe = flags("--bpe"))
    println(summary)
    spark.stop()
  }
}
