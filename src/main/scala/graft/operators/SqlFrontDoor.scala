package graft.operators

import org.apache.spark.sql.DataFrame

import graft.Query
import graft.sources.Tables

/** The SQL-only consumer path, end to end: a headline pipeline expressed
  * entirely as `spark.sql(...)` text — no Column API — running through
  * the engine's [[graft.GraftExtensions]] function registrations (here
  * the native codegen'd `vector_dot`; all eight native expressions are
  * SQL-registered the same way and exercised in ScalaTest).
  *
  * This is the integration surface a BI tool / notebook / `spark-sql`
  * shell user gets: enable `spark.sql.extensions=graft.GraftExtensions`,
  * register views over the lake tables, and every graft primitive is a
  * SQL function. The plan Catalyst builds from the SQL text is the SAME
  * plan the Column-API q19 declares (asserted in ScalaTest), so every
  * scale property carries over verbatim: the 10-row query side is
  * broadcast (pinned with a SQL hint — the hint syntax is part of what
  * this entry demonstrates), the corpus streams once, and only scored
  * (id, id, double) triples reach the top-k window.
  */
object SqlFrontDoor {

  /** Exact cosine top-k as pure SQL text over a registered view. */
  def knnBruteSql(spark: org.apache.spark.sql.SparkSession, view: String,
      nQueries: Int, k: Int): DataFrame =
    spark.sql(s"""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM $view
      ),
      n AS (
        SELECT vec_id, v, sqrt(vector_dot(v, v)) AS nrm FROM e
      ),
      scored AS (
        SELECT /*+ BROADCAST(q) */
               q.vec_id AS query_id, c.vec_id AS neighbor_id,
               vector_dot(q.v, c.v) / (q.nrm * c.nrm) AS score
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < $nQueries
      )
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score
      FROM (SELECT *, ROW_NUMBER() OVER
              (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
            FROM scored)
      WHERE rn <= $k
      ORDER BY query_id, rank""")

  /** The curation path as PURE SQL text over the operator-level table
    * functions [[graft.GraftExtensions]] injects (`graft_dedup_keep`,
    * `graft_quantile_gate`, `graft_histogram_drift`): exact-dedup keep
    * list ∩ per-language p-quantile length gate, restricted to languages
    * whose even/odd doc-id cohorts show scaled-L1 length drift below
    * half its maximum, accounted per language. Every FROM-clause function resolves to
    * the SAME DataFrame pipeline its Column-API catalog entry runs
    * (q16 / q73 / q75) — the TVFs splice those logical plans into this
    * query, so the broadcast thresholds, bucketed percentile rank, and
    * integer-exact drift metric are identical in both surfaces. */
  def curationSql(spark: org.apache.spark.sql.SparkSession, view: String,
      p: Double, bins: Int): DataFrame =
    spark.sql(s"""
      WITH kept AS (
        SELECT g.doc_id, g.lang, g.n_chars
        FROM graft_quantile_gate('$view', 'lang', 'n_chars', ${p}D) g
        JOIN graft_dedup_keep('$view') k ON k.doc_id = g.doc_id
      ),
      stable AS (
        SELECT g AS lang
        FROM graft_histogram_drift('$view', 'lang', 'doc_id % 2', 'n_chars', $bins)
        WHERE drift_scaled < n_a * n_b
      )
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_kept
      FROM kept JOIN stable USING (lang)
      GROUP BY lang
      ORDER BY lang""")

  val queries: Seq[Query] = Seq(
    Query(
      "q62_sql_frontdoor",
      "SQL front door: the q19 exact-cosine top-5 pipeline as PURE spark.sql " +
        "text through the GraftExtensions function registrations (native " +
        "vector_dot as a SQL function, broadcast pinned by SQL hint) over a " +
        "registered view — the path a SQL-only consumer of the library runs. " +
        "Same oracle as q19; ScalaTest additionally asserts SQL == Column-API " +
        "results row for row.",
      (s, dir) => {
        Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
        knnBruteSql(s, "graft_embeddings", nQueries = 10, k = 5)
      },
      Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        s AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
          FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
        SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
              FROM s)
        WHERE rn <= 5
        ORDER BY query_id, rank"""))
    ,
    Query(
      "q79_sql_curation",
      "SQL front door, operator level: the curation path (q16 exact-dedup " +
        "keep list -> q73 per-language p25 length gate -> q75 drift-stable " +
        "language filter -> per-language accounting) as PURE spark.sql text " +
        "over injected TABLE-VALUED functions (graft_dedup_keep / " +
        "graft_quantile_gate / graft_histogram_drift). Each TVF splices the " +
        "Column-API operator's own logical plan into the query, so the SQL " +
        "surface inherits the operators' scale shapes verbatim. One DuckDB " +
        "oracle recomputes the whole composition from the base table.",
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("graft_docs")
        curationSql(s, "graft_docs", p = 0.25, bins = 16)
      },
      Some("""
        WITH thr AS (
          SELECT lang, quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS t
          FROM documents GROUP BY 1
        ), keep AS (
          SELECT MIN(doc_id) AS doc_id
          FROM (SELECT doc_id,
                       sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
                FROM documents)
          GROUP BY h
        ), b AS (
          SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents
        ), binned AS (
          SELECT lang,
                 CASE WHEN hi = lo THEN 0
                      ELSE LEAST(CAST(FLOOR((n_chars - lo) / ((hi - lo) / 16)) AS INT), 15)
                 END AS bin,
                 COUNT(*) FILTER (WHERE doc_id % 2 = 0) AS na,
                 COUNT(*) FILTER (WHERE doc_id % 2 = 1) AS nb
          FROM documents, b GROUP BY 1, 2
        ), tot AS (
          SELECT lang, SUM(na) AS ta, SUM(nb) AS tb FROM binned GROUP BY 1
        ), stable AS (
          SELECT lang
          FROM (SELECT bn.lang, SUM(ABS(bn.na * t.tb - bn.nb * t.ta)) AS ds,
                       MAX(t.ta) AS ta, MAX(t.tb) AS tb
                FROM binned bn JOIN tot t USING (lang) GROUP BY 1)
          WHERE ds < ta * tb
        )
        SELECT d.lang, COUNT(*) AS n_docs, CAST(SUM(d.n_chars) AS BIGINT) AS n_chars_kept
        FROM documents d
        JOIN keep USING (doc_id)
        JOIN thr USING (lang)
        JOIN stable USING (lang)
        WHERE CAST(d.n_chars AS DOUBLE) >= t
        GROUP BY d.lang
        ORDER BY d.lang""")),

    Query(
      "q89_sql_search",
      "SQL front door for hybrid retrieval: `SELECT * FROM graft_search(" +
        "docs, emb, 'data,model', 11, 40, 15)` — the q85 RRF operator as an " +
        "injected table-valued function over registered views, so a " +
        "spark-sql-only consumer runs keyword+vector fusion with one FROM " +
        "clause. The TVF splices the Column-API operator's own logical plan " +
        "(bounded TakeOrdered cuts, broadcast query vector) into the query; " +
        "different terms/query than q85, so the oracle is an independent " +
        "recomputation, not a copy of q85's rows.",
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("graft_docs")
        Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
        s.sql("SELECT * FROM graft_search('graft_docs', 'graft_embeddings', " +
          "'data,model', 11, 40, 15)")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
          FROM documents
        ), kw AS (
          SELECT doc_id, COUNT(*) AS score
          FROM toks WHERE term IN ('data', 'model')
          GROUP BY doc_id
          ORDER BY score DESC, doc_id
          LIMIT 40
        ), kwr AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS kw_rank
          FROM kw
        ), e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), n AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        ), vs AS (
          SELECT c.vec_id,
                 list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
          FROM n q JOIN n c ON q.vec_id = 11 AND c.vec_id != 11
          ORDER BY score DESC, c.vec_id
          LIMIT 40
        ), vr AS (
          SELECT vec_id,
                 CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS INT) AS vec_rank
          FROM vs
        )
        SELECT COALESCE(k.doc_id, v.vec_id) AS doc_id,
               k.kw_rank, v.vec_rank,
               COALESCE(1.0::DOUBLE / (60 + k.kw_rank), 0.0::DOUBLE) +
               COALESCE(1.0::DOUBLE / (60 + v.vec_rank), 0.0::DOUBLE) AS rrf
        FROM kwr k FULL OUTER JOIN vr v ON k.doc_id = v.vec_id
        ORDER BY rrf DESC, doc_id
        LIMIT 15"""))
  )
}
