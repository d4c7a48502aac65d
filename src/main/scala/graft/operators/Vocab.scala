package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Vocabulary induction + out-of-vocabulary scoring — the
  * frequency-filter family of corpus quality signals (an OOV-rate
  * cut against a reference vocabulary is a standard cheap filter for
  * garbled/foreign/boilerplate text in LLM data pipelines).
  *
  * Two stages, each with the canonical scale shape:
  *
  *   - vocabulary: document frequencies over a reference slice via one
  *     token-keyed map-side-combining aggregate, then top-K by
  *     (df DESC, token ASC) — Spark plans the ordered limit as
  *     TakeOrderedAndProject (per-partition top-K, K rows to the
  *     driver), never a global sort;
  *   - scoring: the K-row vocabulary is BROADCAST and the corpus-side
  *     probe is a map-side left join on the exploded tokens feeding one
  *     doc-keyed aggregate — the corpus never shuffles by token.
  *
  * The deterministic tie-break makes the vocabulary — and therefore
  * every downstream count — engine-stable, which the DuckDB oracle
  * checks end-to-end. */
object Vocab {

  /** Top-`k` tokens of `docs` by document frequency (ties broken by
    * token ascending): (token, df). */
  def topVocab(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)

  /** Per-document token and OOV-occurrence counts against `vocab`
    * (a small (token, …) frame, broadcast): (doc_id, n_tokens, n_oov).
    *
    * Uses the split-based [[TextAnalysis.tokens]], not `tokensFast`:
    * an empty/whitespace-only document splits to `[""]` — one (OOV)
    * token — in BOTH Spark and the SQL `string_split` twin, so the doc
    * stays visible to the quality filter instead of silently vanishing
    * (`tokensFast` would emit no rows for it, dropping the doc from the
    * per-document output and diverging from any SQL reimplementation). */
  def oovCounts(corpus: DataFrame, vocab: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, 1)).as("n_oov"))

  val queries: Seq[Query] = Seq(
    Query(
      "q42_oov_score",
      "Out-of-vocabulary scoring: top-16 document-frequency vocabulary from " +
        "the reference slice (doc_id % 97 = 0, deterministic df/token " +
        "tie-break, planned as TakeOrderedAndProject) broadcast against the " +
        "corpus; per-doc token and OOV-occurrence counts via one doc-keyed " +
        "map-side-combining aggregate — the corpus never shuffles by token.",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = topVocab(docs.filter(col("doc_id") % 97 === 0), k = 16)
        oovCounts(docs.filter(col("doc_id") % 97 =!= 0), vocab)
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
          FROM documents
        ), vocab AS (
          SELECT token FROM (
            SELECT token, COUNT(DISTINCT doc_id) AS df
            FROM toks WHERE doc_id % 97 = 0
            GROUP BY token
            ORDER BY df DESC, token ASC
            LIMIT 16)
        )
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        FROM toks t LEFT JOIN vocab v USING (token)
        WHERE t.doc_id % 97 <> 0
        GROUP BY t.doc_id
        ORDER BY t.doc_id"""))
  )
}
