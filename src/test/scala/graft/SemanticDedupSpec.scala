package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SemanticDedup, Similarity}
import graft.sources.Tables

/** q80 SemDeDup: planted-twin recall, a full differential against an
  * independent plain-Scala reimplementation, and determinism. */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val offset = 100000L
  private val tau = 0.95
  private val nCent = 16

  private def corpus = Similarity
    .plantedDupCorpus(Tables.embeddings(spark, sf), offset)
    .withColumnRenamed("emb", "embedding")

  test("planted twins share a component and exactly one member per component survives") {
    val out = SemanticDedup.semanticDedup(corpus, tau, nCent).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val comp = out.map(t => t._1 -> t._2).toMap
    val nOrig = out.map(_._1).count(_ < offset) max out.map(_._1).count(_ >= offset)
    val planted = comp.keys.filter(_ < offset).toSeq
    assert(planted.nonEmpty, "no planted originals were clustered at all")
    // recall floor: a twin can straddle a cluster boundary (the SemDeDup
    // trade), but nearly all land together
    val together = planted.count(id => comp.get(id + offset).contains(comp(id)))
    assert(together.toDouble / planted.size >= 0.9,
      s"only $together/${planted.size} planted twins share a component")
    // election: exactly one keeper per component, and it IS the canonical
    out.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._4) === 1, s"component $c keeper count")
      val keeper = members.find(_._4).get
      assert(members.forall(_._3 == keeper._1), s"component $c canonical mismatch")
    }
    assert(nOrig > 0)
  }

  test("matches the independent plain-Scala reimplementation on the same centroids") {
    // the twin now lives in main (SemanticDedupReference — staged as
    // q80's DuckDB oracle since round 14); this test keeps the fast
    // in-memory differential at spec parameters (16 centroids vs the
    // entry's 64)
    val e = Similarity.prepared(corpus)
    // ivfCentroids is deterministic, so this equals the frame
    // semanticDedup derives internally
    val cent = Similarity.ivfCentroids(e, nCent, lloydIters = 1)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray, r.getDouble(2)))
    val vecs = e.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1).toArray, r.getDouble(2)))
    val expected = SemanticDedupReference.verdicts(vecs, cent, tau).toSet
    assert(expected.nonEmpty, "differential fixture produced no components")
    val got = SemanticDedup.semanticDedup(corpus, tau, nCent).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got === expected)
  }

  test("two runs return identical verdicts") {
    // verdicts keyed by vec_id — sorted before comparing, because the
    // raw collect() order reflects shuffle block FETCH order, which is
    // timing-dependent and not part of the determinism claim (observed
    // flaking under load: identical row sets, different interleaving)
    def run() = SemanticDedup.semanticDedup(corpus, tau, nCent)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(run().toSeq === run().toSeq)
  }
}
