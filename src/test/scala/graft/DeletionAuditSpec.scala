package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, DeletionAudit}

/** q168 — the physical deletion audit's invariants: the erasure proof
  * (zero victim rows on the delete-compacted surface), exact victim
  * accounting on the one-row-per-victim surfaces, and determinism. */
class DeletionAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("audit counts: compacted surface is erased, per-vector surfaces " +
      "hold exactly one row per victim, repeats are deterministic") {
    val got = DeletionAudit.deletionAudit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nVictims = spark.read
      .parquet(s"${AnnIndex.tombstonesStaged(spark, sf)}/ids").count()
    assert(nVictims > 0)
    // the erasure proof: compaction physically dropped every masked row
    // on EVERY family's compacted surface (round 16 closes the gap the
    // r15 audit itself measured: graph/PQ/BM25 had bytes but no op)
    Seq("ivf_delete_compacted", "pq_delete_compacted",
      "bm25_delete_compacted", "graph_dc_edges_src", "graph_dc_edges_dst",
      "graph_dc_vecs", "graph_dc_entries").foreach(sfc =>
      assert(got(sfc) === 0L,
        s"compacted surface $sfc still holds victim bytes"))
    // one row per vector on the vector-keyed surfaces
    assert(got("ivf_lists") === nVictims)
    assert(got("pq_codes") === nVictims)
    assert(got("graph_vecs") === nVictims)
    // soft-deleted nodes stay routable: some edges still point at them
    assert(got("graph_edges_dst") > 0L)
    // victims have text, so their postings exist
    assert(got("bm25_postings") > 0L)
    val again = DeletionAudit.deletionAudit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === again)
  }

  test("the audit never scans the source tables — only staged segments " +
      "and the tombstone frame") {
    val df = DeletionAudit.deletionAudit(spark, sf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }
    assert(leaves.nonEmpty)
    leaves.foreach(p => assert(!p.contains("testdata"),
      s"audit scans a source table: $p"))
  }
}
