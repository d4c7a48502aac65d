package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Inverted-index text retrieval — the lookup side of a corpus: given
  * keyword terms, find the documents containing ALL of them, ranked by
  * combined term frequency. Curation pipelines use exactly this shape
  * for targeted audits ("show me the docs matching these boilerplate
  * markers") and for decontamination spot-checks (q39 is the bulk
  * set-intersection twin; this is the interactive per-query form).
  *
  * Shape: tokenize + explode (map-only), then the q-term `isin` filter
  * runs BEFORE any aggregation — the exchange only ever carries
  * postings for the QUERY's terms, a |terms|/|vocab| sliver of the
  * corpus token stream, combined map-side to at most one
  * (term, doc, tf) row per doc per term per task. Conjunction is a
  * doc-keyed count (terms are distinct per posting row, so matched-term
  * count needs no DISTINCT), ranking is `TakeOrdered` top-k — per-
  * partition heaps merged on the driver, k rows, never a global sort.
  *
  * On a persisted deployment the postings frame is the index: written
  * once bucketed by `term` (the q51 layout), a query's `isin` filter
  * partition-prunes to q buckets and the scan never touches the rest of
  * the vocabulary — the same write-once/read-many economics as the ANN
  * indexes (X71).
  */
object TextIndex {

  /** (term, doc_id, tf) postings from a (doc_id, text) corpus — the
    * inverted-index rows, one per distinct term per doc. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Top-k docs containing ALL `terms`, ranked by summed term frequency
    * (ties to smallest doc_id — a total order, so top-k is
    * deterministic). The term filter precedes the postings aggregate:
    * only query-term tokens reach the exchange. */
  def conjunctiveSearch(docs: DataFrame, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "conjunctiveSearch needs at least one term")
    require(terms.distinct.size == terms.size, s"duplicate query terms: $terms")
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("score"))
      .filter(col("n_terms") === terms.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q84_index_search",
      "Conjunctive keyword search over the documents corpus: top-20 docs " +
        "containing ALL of {spark, join, filter}, ranked by summed term " +
        "frequency (ties to smallest doc_id). The 3-term isin filter " +
        "runs before any aggregate, so the exchange carries only the " +
        "query terms' postings — never the vocabulary — and the final " +
        "ranking is TakeOrdered top-k, never a global sort. Integer " +
        "scores end to end: the oracle re-derives postings from the " +
        "same tokenization and compares exactly.",
      (s, dir) => conjunctiveSearch(
        Tables.documents(s, dir), Seq("spark", "join", "filter"), k = 20),
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
          FROM documents
        ), postings AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM toks
          WHERE term IN ('spark', 'join', 'filter')
          GROUP BY doc_id, term
        )
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
        FROM postings
        GROUP BY doc_id
        HAVING COUNT(*) = 3
        ORDER BY score DESC, doc_id
        LIMIT 20"""))
  )
}
