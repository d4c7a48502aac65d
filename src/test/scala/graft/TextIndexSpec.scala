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

  // ---- q108 BM25 ----

  /** Plain-Scala BM25 reference — same tokenization, Lucene idf. */
  private def refBm25(docs: Seq[(Long, String)], terms: Seq[String],
      k: Int, k1: Double, b: Double): Seq[(Long, Long, Double)] = {
    val toks = docs.map { case (id, text) =>
      id -> text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
    }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfs = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val matched = terms.filter(t => ts.contains(t))
      if (matched.isEmpty) None
      else {
        val score = matched.map { t =>
          val tf = ts.count(_ == t).toDouble
          val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
          idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * ts.size.toDouble / avgdl))
        }.sum
        Some((id, matched.size.toLong, score))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(k)
  }

  test("bm25Search is disjunctive and matches the plain-Scala reference at 1e-12") {
    import spark.implicits._
    val rows = Seq(
      (1L, "cat dog cat"),
      (2L, "cat dog dog cat extra words making this one longer"),
      (3L, "cat cat cat"),            // one term only — still ranked (OR)
      (4L, "fish only here"),         // no term — excluded
      (5L, "dog"))
    val docs = rows.toDF("doc_id", "text")
    val got = TextIndex.bm25Search(docs, Seq("cat", "dog"), k = 10,
        k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = refBm25(rows, Seq("cat", "dog"), k = 10, k1 = 1.2, b = 0.75)
    assert(got.map(_._1).toSeq === exp.map(_._1))
    got.zip(exp).foreach { case ((gi, gn, gs), (ei, en, es)) =>
      assert(gn === en, s"doc $gi matched-term count")
      assert(math.abs(gs - es) < 1e-12, s"doc $gi: $gs vs $es")
    }
    assert(!got.map(_._1).contains(4L))
    assert(got.map(_._1).contains(3L)) // disjunctive: single-term doc ranks
  }

  test("q108 matches the plain-Scala BM25 on sf0.001 and keeps the top-k plan") {
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec, SortExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val collected = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = refBm25(collected, Seq("spark", "join", "filter"),
      k = 20, k1 = 1.2, b = 0.75)
    // the catalog row is the integer-rank emit (round-16):
    // (doc_id, rank, n_terms, tf_sum, dl) in rank order
    val got = SparkEntry.queries("q108_bm25_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty, "fixture corpus matched no docs — pick other terms")
    assert(got.map(_._1).toSeq === exp.map(_._1),
      "catalog rank order diverged from the plain-Scala BM25")
    assert(got.map(_._2).toSeq === (1 to got.size),
      "rank must be the contiguous 1..k sequence in row order")
    got.zip(exp).foreach { case ((gi, _, gn), (_, en, _)) =>
      assert(gn === en, s"doc $gi matched-term count")
    }
    // the top-k plan claim concerns the corpus-ranking machinery (the
    // catalog wrapper adds one ≤k-row rank window on top)
    val out = TextIndex.bm25Search(Tables.documents(spark, sf),
      Seq("spark", "join", "filter"), k = 20, k1 = 1.2, b = 0.75)
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
      "expected TakeOrderedAndProject for the BM25 top-k")
    assert(!nodes.exists(_.isInstanceOf[SortExec]),
      "unexpected global SortExec in the BM25 plan")
  }

  test("q126: indexed BM25 equals the in-flight form at 1e-12 with identical ranking") {
    val terms = Seq("spark", "join", "filter")
    val flight = TextIndex.bm25Search(Tables.documents(spark, sf), terms,
        k = 20, k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val indexed = TextIndex.bm25SearchIndexed(spark, sf, terms,
        k = 20, k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(indexed.nonEmpty)
    assert(indexed.map(_._1).toSeq === flight.map(_._1).toSeq,
      "indexed ranking order diverged from the in-flight form")
    indexed.zip(flight).foreach { case ((gi, gn, gs), (_, en, es)) =>
      assert(gn === en, s"doc $gi matched-term count")
      assert(math.abs(gs - es) < 1e-12, s"doc $gi: $gs vs $es")
    }
  }

  test("q126: query plan never tokenizes or reads the documents table; the scan is bucket-pruned") {
    import spark.implicits._
    val terms = Seq("spark", "join", "filter")
    val df = TextIndex.bm25SearchIndexed(spark, sf, terms,
      k = 20, k1 = 1.2, b = 0.75)
    // no Generate: the tokenize/explode pass exists only at build time
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.isEmpty, s"indexed BM25 must not explode/tokenize:\n${gens.mkString("\n")}")
    val leaves = df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }
    assert(leaves.exists(_.contains("graft_bm25_")),
      s"expected an index scan among leaves:\n${leaves.mkString("\n")}")
    assert(!leaves.exists(_.contains("documents.parquet")),
      "indexed BM25 query must never touch the documents table")
    // execution-level pruning evidence: every file the candidate scan
    // actually reads lives in one of the query terms' bucket directories
    val wantBuckets = terms.map(TextIndex.termBucketLocal).distinct.toSet
    val idx = TextIndex.bm25Index(spark, sf)
    val files = spark.read.parquet(s"$idx/postings")
      .filter(col("tbucket").isin(wantBuckets.toSeq: _*) &&
        col("term").isin(terms: _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
    assert(files.nonEmpty)
    files.foreach(f => assert(
      wantBuckets.exists(bk => f.contains(s"tbucket=$bk/")),
      s"file outside the pruned buckets: $f"))
  }

  test("q127: appended BM25 ranks identically to the full index and the in-flight form") {
    val terms = Seq("spark", "join", "filter")
    val appended = TextIndex.bm25SearchAppended(spark, sf, terms,
        k = 20, k1 = 1.2, b = 0.75)
    // no Generate anywhere: both segments are persisted postings
    val gens = appended.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.isEmpty, "appended BM25 must not explode/tokenize")
    val got = appended.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    Seq(
      TextIndex.bm25SearchIndexed(spark, sf, terms, k = 20, k1 = 1.2, b = 0.75),
      TextIndex.bm25Search(Tables.documents(spark, sf), terms,
        k = 20, k1 = 1.2, b = 0.75)
    ).foreach { twin =>
      val want = twin.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.map(_._1).toSeq === want.map(_._1).toSeq,
        "appended ranking order diverged")
      got.zip(want).foreach { case ((gi, gn, gs), (_, en, es)) =>
        assert(gn === en, s"doc $gi matched-term count")
        assert(math.abs(gs - es) < 1e-12, s"doc $gi: $gs vs $es")
      }
    }
  }

  test("q127: segments are disjoint, complete, and delta-sized") {
    import spark.implicits._
    val (baseRoot, deltaRoot) = TextIndex.bm25DeltaIndex(spark, sf)
    val base = spark.read.parquet(s"$baseRoot/postings")
    val delta = spark.read.parquet(s"$deltaRoot/postings")
    assert(delta.filter(col("doc_id") % 10 =!= 0).count() === 0)
    assert(base.filter(col("doc_id") % 10 === 0).count() === 0)
    // segment metas sum to the full corpus bounds
    val metas = spark.read.parquet(s"$baseRoot/meta")
      .unionByName(spark.read.parquet(s"$deltaRoot/meta"))
      .agg(sum("__n"), sum("__sumdl")).as[(Long, Long)].collect().head
    val idx = TextIndex.bm25Index(spark, sf)
    val full = spark.read.parquet(s"$idx/meta")
      .as[(Long, Long)].collect().head
    assert(metas === full, "segment metas must sum to the full-index bounds")
    // postings union equals the full index's postings row set
    assert(base.unionByName(delta)
      .exceptAll(spark.read.parquet(s"$idx/postings")).count() === 0)
    assert(base.count() + delta.count() ===
      spark.read.parquet(s"$idx/postings").count())
  }

  test("termBucket expression equals the driver twin on multi-script terms") {
    import spark.implicits._
    val terms = Seq("spark", "join", "filter", "héllo", "日本語", "a", "🚀")
    val got = terms.toDF("t")
      .select(col("t"), TextIndex.termBucket(col("t")).as("b"))
      .as[(String, Long)].collect().toMap
    terms.foreach(t =>
      assert(got(t) === TextIndex.termBucketLocal(t), s"term $t"))
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

  // ---- q166: document DELETE on the persisted BM25 index ----

  test("q166: deleted-index BM25 ranks identically to a from-scratch " +
      "rebuild over the surviving corpus (stats-exact delete)") {
    val terms = Seq("spark", "join", "filter")
    val deleted = TextIndex.bm25SearchDeleted(spark, sf, terms, k = 20,
        k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // survivor rebuild: the in-flight BM25 over the corpus minus the
    // victims — a genuinely independent path (tokenize + aggregate +
    // fresh stats), not the index
    val survivors = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 5)
    val rebuilt = TextIndex.bm25Search(survivors, terms, k = 20,
        k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(deleted.map(_._1).toSeq === rebuilt.map(_._1).toSeq,
      "deleted index ranks differently from the survivor rebuild")
    deleted.zip(rebuilt).foreach { case ((di, dn, ds), (_, rn, rs)) =>
      assert(dn === rn, s"doc $di matched-term count")
      assert(math.abs(ds - rs) < 1e-12,
        s"doc $di: deleted-index score $ds vs rebuild $rs — the corpus " +
          "stats were not adjusted exactly")
    }
    // determinism
    val again = TextIndex.bm25SearchDeleted(spark, sf, terms, k = 20,
        k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(deleted.toSeq === again.toSeq)
  }

  test("q166: staleness differential — the pre-delete index serves " +
      "victims, the deleted index never does, and the recomposed " +
      "bounds equal the survivor aggregate exactly") {
    val terms = Seq("spark", "join", "filter")
    val pre = TextIndex.bm25SearchIndexed(spark, sf, terms, k = 20,
        k1 = 1.2, b = 0.75)
      .collect().map(_.getLong(0))
    assert(pre.exists(_ % 10 == 5),
      "differential vacuous: no victim in the pre-delete top-k")
    val post = TextIndex.bm25SearchDeleted(spark, sf, terms, k = 20,
        k1 = 1.2, b = 0.75)
      .collect().map(_.getLong(0))
    assert(post.forall(_ % 10 != 5), "a retracted document was served")
    // bounds recomposition is exact: meta - tombstones == survivor agg
    val idx = TextIndex.bm25Index(spark, sf)
    val ts = spark.read.parquet(
      s"${TextIndex.bm25TombstonesStaged(spark, sf)}/ids")
    val meta = spark.read.parquet(s"$idx/meta").head()
    val tsAgg = ts.agg(count(lit(1)), sum("dl")).head()
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 5)
      .agg(count(lit(1)), sum(size(toks).cast("long"))).head()
    assert(meta.getLong(0) - tsAgg.getLong(0) === want.getLong(0))
    assert(meta.getLong(1) - tsAgg.getLong(1) === want.getLong(1))
  }

  // ---- q171: BM25 delete COMPACTION (physical erasure) ----

  test("q171: compacted index ranks bit-identically to the tombstoned " +
      "probe and carries zero victim bytes") {
    val terms = Seq("spark", "join", "filter")
    val compacted = TextIndex.bm25SearchDeleteCompacted(spark, sf, terms,
        k = 20, k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val deleted = TextIndex.bm25SearchDeleted(spark, sf, terms, k = 20,
        k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(compacted.nonEmpty)
    // same candidates, same df, same bounds → bit-identical scores
    assert(compacted.toSeq === deleted.toSeq,
      "compaction changed the ranking vs the tombstone anti-join")
    // physical erasure: no victim row remains in the compacted postings
    val idx = TextIndex.bm25DeleteCompactIndex(spark, sf)
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") % 10 === 5).count() === 0,
      "victim postings survived the compaction rewrite")
    // recomposed meta equals the survivor aggregate exactly
    val meta = spark.read.parquet(s"$idx/meta").head()
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 5)
      .agg(count(lit(1)), sum(size(toks).cast("long"))).head()
    assert(meta.getLong(0) === want.getLong(0))
    assert(meta.getLong(1) === want.getLong(1))
    // the compacted probe plan carries no anti-join at all
    val plan = TextIndex.bm25SearchDeleteCompacted(spark, sf, terms,
      k = 20, k1 = 1.2, b = 0.75).queryExecution.optimizedPlan
    val antis = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.isEmpty, "compacted probe must not anti-join tombstones")
  }

  test("rankedBm25 emit: rank follows (score DESC, doc_id) with integer " +
      "stats carried verbatim") {
    val terms = Seq("spark", "join", "filter")
    val scored = TextIndex.bm25Search(Tables.documents(spark, sf), terms,
        k = 20, k1 = 1.2, b = 0.75)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    val ranked = SparkEntry.queries("q108_bm25_search")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(ranked.map(_._1).toSeq === scored.map(_._1).toSeq)
    ranked.zip(scored).zipWithIndex.foreach {
      case (((ri, rk, rn, rt, rd), (si, sn, _, st, sd)), i) =>
        assert(ri === si); assert(rk === i + 1)
        assert(rn === sn); assert(rt === st); assert(rd === sd)
    }
  }

  test("integer-rank oracle margin guard: adjacent ranked scores differ " +
      "by >= 16 ulps (or are bit-equal ties) on the driver's corpora") {
    // The bm25 hash oracles drop the double score and hash the RANK,
    // whose cross-engine stability rests on no two structurally
    // different stat vectors scoring within ~1 ulp of each other
    // (idf rides ln(), the one libm call). This guard makes a future
    // corpus/terms change surface the fragility as a NAMED diagnostic
    // instead of a bare hash mismatch (r16 advice). Adjacent pairs
    // with bit-equal scores are identical-stat ties — the doc_id
    // tie-break covers those deterministically. The k+1 window covers
    // the limit boundary: a flip across rank k changes WHICH doc the
    // entries emit, not just its position.
    val terms = Seq("spark", "join", "filter")
    for (tier <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val scores = TextIndex.bm25Search(Tables.documents(spark, tier),
          terms, k = 25, k1 = 1.2, b = 0.75)
        .collect().map(_.getDouble(2)).take(21)
      assert(scores.nonEmpty, s"no bm25 matches on $tier — change terms")
      scores.zip(scores.drop(1)).zipWithIndex.foreach { case ((a, b0), i) =>
        val ba = java.lang.Double.doubleToLongBits(a)
        val bb = java.lang.Double.doubleToLongBits(b0)
        val ulps = math.abs(ba - bb)
        assert(ulps == 0L || ulps >= 16L,
          s"$tier rank ${i + 1}->${i + 2}: scores $a vs $b0 are $ulps " +
            "ulps apart — inside libm's ln() divergence margin; the " +
            "integer-rank oracle can flip between engines here")
      }
    }
  }
}
