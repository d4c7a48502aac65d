package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Profiling}
import graft.sources.Tables

/** q79 — the operator-level SQL front door. The contract mirrors q62's:
  * every injected table-valued function must return row-for-row the
  * SAME frame its Column-API operator computes (it splices that very
  * logical plan, so anything else is a wiring bug), and the composed
  * curation SQL must run end to end over a registered view. The
  * value-level parity against DuckDB is the q79 oracle's job. */
class SqlFrontDoorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables.documents(spark, sf)

  private def registered(): Unit =
    docs.createOrReplaceTempView("graft_docs")

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("graft_dedup_keep TVF equals Dedup.exactKeepList row for row") {
    registered()
    val viaSql = spark.sql("SELECT * FROM graft_dedup_keep('graft_docs')")
    assert(sorted(viaSql) === sorted(Dedup.exactKeepList(docs)))
  }

  test("graft_segment_dedup TVF equals Dedup.segmentDedup row for row") {
    registered()
    val viaSql = spark.sql("SELECT * FROM graft_segment_dedup('graft_docs', 10)")
    assert(sorted(viaSql) === sorted(Dedup.segmentDedup(docs, w = 10)))
  }

  test("graft_containment TVF equals Dedup.containmentJoin row for row") {
    registered()
    val viaSql = spark.sql("SELECT * FROM graft_containment('graft_docs', 3, 0.8D)")
    assert(sorted(viaSql) === sorted(Dedup.containmentJoin(docs, n = 3, tau = 0.8)))
    assert(viaSql.count() > 0) // sf0.001 plants exact twins: containment 1.0
  }

  test("graft_bm25 TVF equals the direct bm25Search path row for row") {
    registered()
    val viaSql = spark.sql(
      "SELECT * FROM graft_bm25('graft_docs', 'spark, join, filter', 20)")
    val direct = graft.operators.TextIndex.bm25Search(docs,
      Seq("spark", "join", "filter"), k = 20, k1 = 1.2, b = 0.75)
    assert(sorted(viaSql) === sorted(direct))
    assert(viaSql.count() > 0)
  }

  test("graft_bm25_indexed TVF equals the direct persisted-index path row for row") {
    val viaSql = spark.sql(
      s"SELECT * FROM graft_bm25_indexed('$sf', 'spark, join, filter', 20)")
    val direct = graft.operators.TextIndex.bm25SearchIndexed(spark, sf,
      Seq("spark", "join", "filter"), k = 20, k1 = 1.2, b = 0.75)
    assert(sorted(viaSql) === sorted(direct))
    assert(viaSql.count() > 0)
  }

  test("graft_edit_join TVF equals the direct editJoin path row for row") {
    registered()
    import spark.implicits._
    val names = Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    names.createOrReplaceTempView("graft_names")
    val viaSql = spark.sql("SELECT * FROM graft_edit_join('graft_names', 1)")
    assert(sorted(viaSql) === sorted(graft.operators.Fuzzy.editJoin(names, 1)))
    assert(viaSql.count() > 0)
  }

  test("graft_scd2 TVF equals the direct scd2 path row for row") {
    registered()
    val ev = Tables.events(spark, sf)
    ev.createOrReplaceTempView("graft_events")
    val viaSql = spark.sql(
      "SELECT * FROM graft_scd2('graft_events', 'user_id', 'ts', 'event_id', 'event_type')")
    val direct = graft.operators.SnapshotDiff.scd2(
      ev, "user_id", "ts", "event_id", "event_type")
    assert(sorted(viaSql) === sorted(direct))
    assert(viaSql.count() > 0)
  }

  test("graft_lm_bigram TVF equals the direct model+score path row for row") {
    registered()
    val ref = docs.filter(col("doc_id") % 3 =!= 0)
    ref.createOrReplaceTempView("graft_ref_docs")
    val held = docs.filter(col("doc_id") % 3 === 0)
    held.createOrReplaceTempView("graft_held_docs")
    val viaSql = spark.sql(
      "SELECT * FROM graft_lm_bigram('graft_held_docs', 'graft_ref_docs', 2)")
    val direct = graft.operators.Vocab.bigramBackoffScore(held,
      graft.operators.Vocab.bigramModel(ref, floor = 2L),
      graft.operators.Vocab.unigramModel(ref))
    assert(sorted(viaSql) === sorted(direct))
    assert(viaSql.count() > 0)
  }

  test("graft_bpe_encode TVF equals the direct learn+encode path row for row") {
    registered()
    val viaSql = spark.sql("SELECT * FROM graft_bpe_encode('graft_docs', 12)")
    val (_, words) = graft.operators.Bpe.learn(docs, merges = 12)
    val direct = graft.operators.Bpe.encode(docs,
      words.select(col("word"), col("syms")),
      graft.operators.Bpe.subwordIds(graft.operators.Bpe.subwordVocab(words)))
    assert(sorted(viaSql) === sorted(direct))
    assert(viaSql.count() > 0)
    words.unpersist()
    spark.sharedState.cacheManager.clearCache()
  }

  test("graft_quantile_gate TVF equals Curation.quantileFilter row for row") {
    registered()
    val viaSql = spark.sql(
      "SELECT * FROM graft_quantile_gate('graft_docs', 'lang', 'n_chars', 0.25D)")
    val viaApi = Curation.quantileFilter(
        docs.withColumn("x", col("n_chars").cast("double")), "lang", p = 0.25)
      .drop("x", "thr")
    assert(viaSql.columns.toSeq === viaApi.columns.toSeq)
    assert(sorted(viaSql) === sorted(viaApi))
    // the decimal-literal spelling must gate identically (doubleArg
    // accepts both, so callers need not remember the D suffix)
    val viaDec = spark.sql(
      "SELECT * FROM graft_quantile_gate('graft_docs', 'lang', 'n_chars', 0.25)")
    assert(sorted(viaDec) === sorted(viaApi))
  }

  test("graft_histogram_drift TVF equals Profiling.histogramDrift row for row") {
    registered()
    val viaSql = spark.sql(
      "SELECT * FROM graft_histogram_drift('graft_docs', 'lang', 'doc_id % 2', 'n_chars', 16)")
    val viaApi = Profiling.histogramDrift(
      docs, col("lang"), col("doc_id") % 2, col("n_chars"), nBins = 16)
    assert(sorted(viaSql) === sorted(viaApi))
  }

  test("q79 composed curation SQL runs over the view and accounts per language") {
    val out = SparkEntry.queries("q79_sql_curation")(spark, sf).collect()
    assert(out.nonEmpty)
    // per-language rows, each with positive counts
    assert(out.map(_.getString(0)).distinct.length === out.length)
    assert(out.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
  }

  test("graft_search TVF equals Retrieval.hybridRrf bit for bit") {
    registered()
    Tables.embeddings(spark, sf).createOrReplaceTempView("graft_embeddings")
    val viaSql = spark.sql(
      "SELECT * FROM graft_search('graft_docs', 'graft_embeddings', 'data,model', 11, 40, 15)")
      .collect().map(_.toString).toSeq
    val viaApi = operators.Retrieval.hybridRrf(
      docs, Tables.embeddings(spark, sf),
      Seq("data", "model"), queryId = 11L, nCand = 40, k = 15)
      .collect().map(_.toString).toSeq
    assert(viaSql === viaApi)
    assert(viaSql.length === 15)
  }

  test("graft_auc TVF equals Eval.aucReliability row for row") {
    val scored = operators.Logit.scored(operators.Logit.features(spark, sf))
    scored.createOrReplaceTempView("graft_scored")
    val viaSql = spark.sql(
      "SELECT * FROM graft_auc('graft_scored', 'p_keep', 'label')")
    assert(sorted(viaSql) ===
      sorted(operators.Eval.aucReliability(scored)))
    assert(viaSql.count() > 0)
  }

  test("graft_dsir TVF equals the staged q134 selection id for id") {
    registered()
    val viaSql = spark.sql("SELECT * FROM graft_dsir('graft_docs', 'en', 50)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the API twin: same weights (DsirSpec proves them twin-exact),
    // same ordering and quota
    val gb = operators.Dsir.gramBuckets(docs, col("lang") === "en")
    val w = operators.Dsir.docWeights(gb,
      operators.Dsir.bucketLogRatios(spark, gb))
    val viaApi = operators.Dsir.selectTopK(
      w.withColumn("w_u",
        floor(w("w").cast("decimal(22,15)") * lit(1000000)).cast("long")),
      k = 50).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi)
    assert(viaSql.length === 50)
  }
}
