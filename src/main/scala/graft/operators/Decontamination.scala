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

  /** Per-document MEMORIZATION-RISK audit: how many of a document's
    * distinct word `n`-grams occur in NO other document (corpus
    * document frequency 1). Deduplication removes repeated text —
    * the published extraction-risk driver (memorized sequences are
    * overwhelmingly the highly duplicated ones) — but its complement
    * matters too: after dedup, the residual risk surface is the long
    * UNIQUE spans (PII strings, keys, verbatim rare text) that an
    * extraction attack can regurgitate exactly because nothing else
    * anchors them. Output per doc: distinct span count and the
    * unique-span count the risk policy thresholds on.
    *
    * Shape: the q39 in-row-distinct gram explode (array_distinct
    * before the explode, so no corpus-wide distinct shuffle), one
    * gram-keyed count — the df aggregate, map-side-combinable, linear
    * in total grams — and one gram-keyed join back; grams travel as
    * fused xxhash64 chains, never strings (the q39 hashing argument:
    * a wrong count needs a 2^-64 collision; the oracle joins the
    * literal gram strings). */
  def memorizationRisk(docs: DataFrame, n: Int = 8): DataFrame = {
    val grams = TextAnalysis.shingleHashArray(
      TextAnalysis.tokensFast(col("text")), n)
    val docGrams = docs.select(col("doc_id"),
      explode(array_distinct(grams)).as("g"))
    val df = docGrams.groupBy("g").agg(count(lit(1)).as("df"))
    val per = docGrams.join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("uniq_spans"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("uniq_spans"), lit(0L)).as("uniq_spans"))
      .orderBy("doc_id")
  }

  /** Pairwise source-overlap matrix: for every pair of `source` values,
    * how many distinct word `n`-grams the two sources share — the
    * corpus-level mirror of [[contaminationCounts]]'s per-doc check,
    * used to rank which source pairs need a dedup/decontamination pass
    * between them (mirror-site detection, scraped-twice feeds).
    *
    * Shape: one (source, gram)-distinct aggregate, then a gram-keyed
    * `collect_set(source)` whose size is bounded by the SOURCE COUNT
    * (an enumerable dimension — tens to thousands — never corpus-
    * scale), and a map-side ordered-pair explode of each set (≤ C(S,2)
    * rows per gram). No gram-keyed self-join: the set form touches each
    * gram once where the join form would square the hot grams'
    * posting lists. Grams travel as fused xxhash64 chains (the q39
    * argument: a cross-gram collision needs p≈2^-64, and only COUNTS
    * are observable) — 8-byte keys instead of n-token strings on both
    * exchanges; the oracle re-derives the same counts from the literal
    * gram strings, which also makes it a hash-collision check. */
  def sourceOverlap(docs: DataFrame, n: Int): DataFrame = {
    val grams = TextAnalysis.shingleHashArray(
      TextAnalysis.tokensFast(col("text")), n)
    val srcGrams = docs
      .select(col("source"), explode(array_distinct(grams)).as("gram"))
      .distinct()
    srcGrams
      .groupBy("gram").agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(col("srcs"), (a, i) =>
        transform(slice(col("srcs"), i + lit(2), size(col("srcs"))),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("src_a", "src_b")
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
        ORDER BY doc_id""")),

    Query(
      "q88_source_overlap",
      "Pairwise source-overlap matrix: distinct shared 3-gram counts for " +
        "every source pair — which feeds need a cross-dedup pass between " +
        "them. One (source, gram)-distinct aggregate, a gram-keyed " +
        "collect_set bounded by the source count, and a map-side " +
        "ordered-pair explode (≤ C(S,2) rows per gram) — no gram-keyed " +
        "self-join squaring hot grams' posting lists. Integer counts; the " +
        "oracle takes the self-join formulation over the same distinct " +
        "(source, gram) pairs, proving the set form equivalent.",
      (s, dir) => sourceOverlap(Tables.documents(s, dir), n = 3),
      Some("""
        WITH toks AS (
          SELECT source, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT source,
                 unnest(list_transform(range(1, len(ws) - 1),
                                       i -> array_to_string(ws[i:i+2], ' '))) AS gram
          FROM toks
          WHERE len(ws) >= 3
        )
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM sh a JOIN sh b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    Query(
      "q161_memorization_risk",
      "Per-document MEMORIZATION-RISK audit: how many of each " +
        "document's distinct 8-grams occur in NO other document " +
        "(corpus df = 1). Dedup removes the repeated-text extraction " +
        "driver; the residual risk surface is the long UNIQUE spans " +
        "(PII strings, keys, verbatim rare text) an extraction attack " +
        "can regurgitate — this emits the per-doc span/unique-span " +
        "counts the risk policy thresholds on. In-row-distinct gram " +
        "explode (no corpus-wide distinct shuffle), one map-side-" +
        "combinable df aggregate, one gram-keyed join back — linear " +
        "in total grams; grams travel as fused xxhash64 chains (a " +
        "wrong count needs a 2^-64 collision), while the oracle joins " +
        "the literal gram strings.",
      (s, dir) => memorizationRisk(Tables.documents(s, dir), n = 8),
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
        ), df AS (
          SELECT g, COUNT(*) AS df FROM grams GROUP BY g
        ), per AS (
          SELECT doc_id, COUNT(*) AS n_spans,
                 CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS uniq_spans
          FROM grams JOIN df USING (g)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(p.uniq_spans, 0) AS BIGINT) AS uniq_spans
        FROM documents d LEFT JOIN per p USING (doc_id)
        ORDER BY doc_id"""))
  )
}
