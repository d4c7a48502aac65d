package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query

/** Physical deletion audit — the compliance half of the delete family
  * (q163/q164/q166/q167): LOGICAL delete guarantees a retracted vector
  * or document is never SERVED, but its bytes still sit in the
  * persisted segments until a compaction physically drops them, and a
  * right-to-be-forgotten process must be able to PROVE where residual
  * bytes remain. This audit counts tombstoned-id occurrences across
  * every persisted index surface — IVF inverted lists, the
  * delete-compacted IVF rewrite, PQ code rows, graph adjacency (victims
  * as edge DESTINATIONS — the rows that make soft-deleted nodes still
  * routable), the graph's vector sidecar, and BM25 postings — one row
  * per surface, integer counts only.
  *
  * Reading the report: positive counts on the un-compacted surfaces are
  * EXPECTED (they are what "logical delete" means — the serving paths
  * anti-join them away, spec-gated per family); the delete-compacted
  * surface must read ZERO — that is the erasure proof, and the gap
  * between the two is the compaction backlog a retention policy
  * schedules against.
  *
  * Scale shape: each surface is one semi-join of a persisted segment
  * against the broadcast ids-only tombstone frame folded into a count —
  * map-side work per segment, one tiny aggregate, no corpus scan
  * (the documents/embeddings tables are never read). */
object DeletionAudit {

  /** (surface → staged root) of the last audit run — late-bound into
    * the oracle SQL (the staged-root thunk convention). */
  @volatile private[graft] var auditOracleRoots: Option[Map[String, String]] = None

  /** One audited surface: name, the frame holding potential victim
    * rows, the id column the tombstones match on, and the tombstone
    * frame's own id column (vec_id for the vector families, doc_id
    * for the text index — each surface is audited against the ids its
    * OWN delete path honors; round-15 advice: the BM25 surface joined
    * the VECTOR tombstones, which only counted correctly while the
    * two id spaces coincided). */
  private def surfaceCount(df: DataFrame, ts: DataFrame, idCol: String,
      tsIdCol: String, surface: String): DataFrame =
    df.select(col(idCol).as("__id"))
      .join(broadcast(ts.select(col(tsIdCol).as("__id"))), Seq("__id"))
      .agg(count(lit(1)).as("n_victim_rows"))
      .select(lit(surface).as("surface"), col("n_victim_rows"))

  def deletionAudit(spark: SparkSession, dir: String): DataFrame = {
    val ivf = AnnIndex.ivfIndex(spark, dir)
    val ivfDc = AnnIndex.ivfDeleteCompactIndex(spark, dir)
    val pq = AnnIndex.pqIndex(spark, dir)
    val pqDc = AnnIndex.pqDeleteCompactIndex(spark, dir)
    val graph = NnDescent.graphIndexStaged(spark, dir)
    val graphDc = GraphServe.graphDeleteCompactIndexStaged(spark, dir)
    val bm25 = TextIndex.bm25Index(spark, dir)
    val bm25Dc = TextIndex.bm25DeleteCompactIndex(spark, dir)
    val tsRoot = AnnIndex.tombstonesStaged(spark, dir)
    val bm25TsRoot = TextIndex.bm25TombstonesStaged(spark, dir)
    auditOracleRoots = Some(Map(
      "ivf" -> Staging.abs(ivf), "ivf_dc" -> Staging.abs(ivfDc),
      "pq" -> Staging.abs(pq), "pq_dc" -> Staging.abs(pqDc),
      "graph" -> Staging.abs(graph), "graph_dc" -> Staging.abs(graphDc),
      "bm25" -> Staging.abs(bm25), "bm25_dc" -> Staging.abs(bm25Dc),
      "ts" -> Staging.abs(tsRoot), "bm25_ts" -> Staging.abs(bm25TsRoot)))
    val ts = spark.read.parquet(s"$tsRoot/ids")
    // the text surfaces audit against the BM25 delete path's OWN
    // doc_id tombstones (round-15 advice — the id spaces need not
    // coincide); the vector surfaces against the vec_id segment
    val bts = spark.read.parquet(s"$bm25TsRoot/ids")
    Seq(
      surfaceCount(spark.read.parquet(s"$ivf/lists"), ts, "vec_id",
        "vec_id", "ivf_lists"),
      surfaceCount(spark.read.parquet(s"$ivfDc/lists"), ts, "vec_id",
        "vec_id", "ivf_delete_compacted"),
      surfaceCount(spark.read.parquet(s"$pq/codes"), ts, "vec_id",
        "vec_id", "pq_codes"),
      surfaceCount(spark.read.parquet(s"$pqDc/codes"), ts, "vec_id",
        "vec_id", "pq_delete_compacted"),
      surfaceCount(spark.read.parquet(s"$graph/edges"), ts, "dst",
        "vec_id", "graph_edges_dst"),
      surfaceCount(spark.read.parquet(s"$graph/vecs"), ts, "vec_id",
        "vec_id", "graph_vecs"),
      surfaceCount(spark.read.parquet(s"$graphDc/edges"), ts, "src",
        "vec_id", "graph_dc_edges_src"),
      surfaceCount(spark.read.parquet(s"$graphDc/edges"), ts, "dst",
        "vec_id", "graph_dc_edges_dst"),
      surfaceCount(spark.read.parquet(s"$graphDc/vecs"), ts, "vec_id",
        "vec_id", "graph_dc_vecs"),
      surfaceCount(spark.read.parquet(s"$graphDc/entries"), ts, "entry_id",
        "vec_id", "graph_dc_entries"),
      surfaceCount(spark.read.parquet(s"$bm25/postings"), bts, "doc_id",
        "doc_id", "bm25_postings"),
      surfaceCount(spark.read.parquet(s"$bm25Dc/postings"), bts, "doc_id",
        "doc_id", "bm25_delete_compacted"))
      .reduce(_ unionByName _)
      .orderBy("surface")
  }

  private def countSql(glob: String, idCol: String, surface: String,
      tsGlob: String, hive: Boolean = false,
      tsIdCol: String = "vec_id"): String = {
    val opts = if (hive) "', hive_partitioning=1)" else "')"
    s"""SELECT '$surface' AS surface, COUNT(*) AS n_victim_rows
          FROM read_parquet('$glob$opts
          WHERE $idCol IN (SELECT $tsIdCol FROM read_parquet('$tsGlob'))"""
  }

  def queries: Seq[Query] = Seq(
    Query(
      "q168_deletion_audit",
      "Physical deletion audit — the compliance proof completing the " +
        "delete family (q163/q164/q166/q167): counts tombstoned-id " +
        "occurrences across EVERY persisted index surface — the four " +
        "logical-delete bases (IVF lists, PQ codes, graph adjacency " +
        "destinations + vector sidecar, BM25 postings) AND, since " +
        "round 16, all four families' delete-COMPACTED rewrites " +
        "(q163's ivfDeleteCompactIndex, q169 PQ, q170 graph — edges " +
        "by src and dst, vecs, and the re-derived entry sample — " +
        "q171 BM25). Positive counts on un-compacted surfaces are " +
        "what logical delete MEANS (serving anti-joins them away, " +
        "spec-gated per family); every compacted surface must read " +
        "ZERO — the erasure proof, now covering the whole store — " +
        "and the gap is the compaction backlog a retention policy " +
        "schedules against. The text surfaces audit against the BM25 " +
        "delete path's own doc_id tombstones, the vector surfaces " +
        "against the vec_id segment (r15 advice: the id spaces need " +
        "not coincide). Each surface is one broadcast semi-join " +
        "folded into a count: map-side per segment, no corpus scan " +
        "anywhere. Oracle: DuckDB recomputes every count from the " +
        "same staged segments, hash-exact (integer columns only).",
      (s, dir) => deletionAudit(s, dir),
      oracleFn = Some(() => auditOracleRoots.map { r =>
        val ts = s"${r("ts")}/ids/*.parquet"
        val bts = s"${r("bm25_ts")}/ids/*.parquet"
        Seq(
          countSql(s"${r("bm25_dc")}/postings/*/*.parquet", "doc_id",
            "bm25_delete_compacted", bts, hive = true, tsIdCol = "doc_id"),
          countSql(s"${r("bm25")}/postings/*/*.parquet", "doc_id",
            "bm25_postings", bts, hive = true, tsIdCol = "doc_id"),
          countSql(s"${r("graph_dc")}/edges/*/*.parquet", "dst",
            "graph_dc_edges_dst", ts, hive = true),
          countSql(s"${r("graph_dc")}/edges/*/*.parquet", "src",
            "graph_dc_edges_src", ts, hive = true),
          countSql(s"${r("graph_dc")}/entries/*.parquet", "entry_id",
            "graph_dc_entries", ts),
          countSql(s"${r("graph_dc")}/vecs/*/*.parquet", "vec_id",
            "graph_dc_vecs", ts, hive = true),
          countSql(s"${r("graph")}/edges/*/*.parquet", "dst",
            "graph_edges_dst", ts, hive = true),
          countSql(s"${r("graph")}/vecs/*/*.parquet", "vec_id",
            "graph_vecs", ts, hive = true),
          countSql(s"${r("ivf_dc")}/lists/*/*.parquet", "vec_id",
            "ivf_delete_compacted", ts, hive = true),
          countSql(s"${r("ivf")}/lists/*/*.parquet", "vec_id",
            "ivf_lists", ts, hive = true),
          countSql(s"${r("pq")}/codes/*.parquet", "vec_id",
            "pq_codes", ts),
          countSql(s"${r("pq_dc")}/codes/*.parquet", "vec_id",
            "pq_delete_compacted", ts))
          .mkString("\n        UNION ALL\n        ") +
          "\n        ORDER BY surface"
      }))
  )
}
