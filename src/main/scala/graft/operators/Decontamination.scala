package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Benchmark decontamination — flag corpus documents that share any
  * word n-gram with a (small) benchmark/eval set, the standard guard
  * against train/test leakage in LLM training pipelines (the n-gram
  * containment check popularized by GPT-3's 13-gram and PaLM's 8-gram
  * decontamination passes; public knowledge, no reference analog —
  * the reference has no text surface at all).
  *
  * Scale shape: the benchmark side is SMALL by nature (eval suites are
  * megabytes; the corpus is the 100 TB side), so its distinct gram-hash
  * set is BROADCAST — the corpus-side check is then a map-side hash
  * probe: one scan, no corpus shuffle for candidate generation, and
  * only a doc-keyed count aggregate (map-side combining) behind it.
  * The corpus explode carries 8-byte gram hashes, never text.
  *
  * Grams are matched by their fused xxhash64 chain
  * ([[TextAnalysis.shingleHashArray]]) rather than gram strings — a
  * cross-doc collision needs p≈2^-64 (same argument as q28's verify,
  * `Dedup.scala`); the DuckDB oracle joins the actual gram strings and
  * the hashes are never oracle-visible.
  */
object Decontamination {

  /** Per-document count of distinct `n`-grams also present in `bench`
    * (both frames: `doc_id`, `text`). Documents with no contaminated
    * gram are kept with a zero count — the downstream filter decides
    * the policy, not the detector. */
  def contaminationCounts(corpus: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    val grams = TextAnalysis.shingleHashArray(
      TextAnalysis.tokensFast(col("text")), n)
    // distinct WITHIN the doc in-row (array_distinct), so the explode
    // already emits unique (doc, gram) pairs — no corpus-wide distinct
    // shuffle is needed before counting
    val corpusGrams = corpus.select(col("doc_id"),
      explode(array_distinct(grams)).as("g"))
    val benchGrams = bench.select(explode(array_distinct(grams)).as("g")).distinct()
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q39_decontaminate",
      "Benchmark decontamination: documents sharing any 8-token gram with " +
        "the benchmark slice (doc_id % 97 = 0) get a per-doc contaminated-gram " +
        "count; the benchmark gram set is broadcast so the corpus-side check " +
        "is a map-side hash probe — one corpus scan, no corpus shuffle before " +
        "the doc-keyed count. Grams matched by fused xxhash64 chains; the " +
        "oracle joins the literal gram strings.",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        contaminationCounts(corpus, bench, n = 8)
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
          FROM documents
        ), grams AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(ws) - 6),
                                       i -> array_to_string(ws[i:i+7], ' '))) AS g
          FROM toks
          WHERE len(ws) >= 8
        ), bench AS (
          SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
        ), hits AS (
          SELECT doc_id, COUNT(*) AS n_contaminated
          FROM grams JOIN bench USING (g)
          WHERE doc_id % 97 <> 0
          GROUP BY doc_id
        )
        SELECT d.doc_id, CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 97 <> 0
        ORDER BY doc_id"""))
  )
}
