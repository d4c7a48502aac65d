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
  )
}
