package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextIndex
import graft.sources.Tables

/** Conjunctive inverted-index search: semantics on handcrafted docs,
  * brute-force differential on the fixture corpus, top-k plan shape. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("conjunction requires ALL terms; score sums tfs; ties break by doc_id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"),        // cat+dog, score 3
      (2L, "cat dog dog cat"),    // score 4
      (3L, "cat cat cat"),        // missing dog -> excluded
      (4L, "dog cat"),            // score 2
      (5L, "dog cat fish"))       // score 2 — ties with 4, doc_id orders
      .toDF("doc_id", "text")
    val got = TextIndex.conjunctiveSearch(docs, Seq("cat", "dog"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 4L), (1L, 3L), (4L, 2L), (5L, 2L)))
  }

  test("k truncates AFTER the deterministic (score, doc_id) order") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b"), (11L, "a b"), (12L, "a a b"))
      .toDF("doc_id", "text")
    val got = TextIndex.conjunctiveSearch(docs, Seq("a", "b"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(12L, 10L)) // 12 wins on score; 10 beats 11 on id
  }

  test("q84 matches a brute-force single-machine search on sf0.001") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val terms = Seq("spark", "join", "filter")
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      val tfs = terms.map(t => toks.count(_ == t))
      if (tfs.forall(_ > 0)) Some((id, tfs.sum.toLong)) else None
    }.sortBy { case (id, score) => (-score, id) }.take(20).toSeq
    val got = SparkEntry.queries("q84_index_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
    assert(got.nonEmpty, "fixture corpus matched no docs — pick other terms")
  }

  test("postings carry one row per distinct (term, doc) with exact tf") {
    import spark.implicits._
    val docs = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    val got = TextIndex.postings(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("x", 1L, 2L), ("y", 1L, 1L), ("y", 2L, 1L)))
  }

  test("search plans TakeOrderedAndProject, never a corpus-wide global sort") {
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec, SortExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val out = TextIndex.conjunctiveSearch(
      Tables.documents(spark, sf), Seq("spark", "join"), k = 5)
    out.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val expanded = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ expanded).flatMap(allNodes)
    }
    val nodes = allNodes(out.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "expected TakeOrderedAndProject for the top-k")
    assert(!nodes.exists(_.isInstanceOf[SortExec]),
      "unexpected global SortExec — top-k must not sort the matched set")
  }
}
