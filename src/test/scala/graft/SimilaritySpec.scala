package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Similarity-search and SimHash tests on sf0.001 plus planted fixtures. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("LSH finds planted near-identical vectors (recall on true near-dups)") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // Plant a barely-perturbed copy of each query vector: scale every
    // element by 1.02 (cosine 1.0 against the original) under a new id.
    val planted = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.02f)).as("embedding"))
    val corpus = emb.union(planted)
    val res = Similarity.knnLsh(corpus, nQueries = 10, k = 5)
      .filter(col("neighbor_id") === col("query_id") + 10000)
    // the planted copy must surface as the rank-1 neighbor for every query
    assert(res.count() === 10)
    assert(res.filter(col("rank") === 1).count() === 10)
  }

  test("LSH recall vs brute force on real (near-random) data, with bounded candidates") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.knnBrute(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.knnLsh(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"real-data recall@5 = $recall%.2f (corpus cosines are near-random, ~0.3 for true top-5)")
    // multi-probe floor: measured ~0.7-0.9 at sf0.001/sf0.1 seeds; 0.4
    // leaves host-independent margin while catching a probe regression
    // back to the old no-probe level (~0.46 at sf0.1, lower here)
    assert(recall >= 0.4,
      f"multi-probe LSH recall collapsed: $recall%.2f")
    // candidate volume must stay well below |Q| x |corpus| (the scale
    // point), probes included — same shape as the operator's probe join
    val e = Similarity.prepared(emb)
    val buckets = Similarity.srpBuckets(e, 32, 14, 64)
    val qb = buckets.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("table"),
        explode(typedlit(Similarity.probeMasks(14, 2))).as("mask"),
        col("bucket"))
      .select(col("query_id"), col("table"),
        col("bucket").bitwiseXOR(col("mask")).as("bucket"))
    val nCand = buckets.join(qb, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct().count()
    assert(nCand < 10L * 500L / 2) // < half the brute-force comparisons
  }

  test("IVF finds planted near-identical vectors and keeps probes selective") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.02f)).as("embedding"))
    val corpus = emb.union(planted)
    // a scaled copy has cosine 1.0 to its original -> identical centroid
    // scores -> same argmax list (deterministic tie-break) -> must
    // surface as the rank-1 neighbor even with selective probing
    val res = Similarity.knnIvf(corpus, nQueries = 10, k = 5,
        centroids = 32, nProbe = 8)
      .filter(col("neighbor_id") === col("query_id") + 10000)
    assert(res.count() === 10)
    assert(res.filter(col("rank") === 1).count() === 10)
  }

  test("IVF recall vs brute force, with candidate volume bounded by the probe fraction") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.knnBrute(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(emb, 10, 5, centroids = 32, nProbe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    val seedsOnly = Similarity.knnIvf(emb, 10, 5, centroids = 32, nProbe = 8,
        lloydIters = 0)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallSeeds = (brute & seedsOnly).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f (seeds-only $recallSeeds%.2f; " +
      "near-random corpus; probes 8 of 32 lists at sf0.001)")
    assert(recall > 0.0)
    assert(recall >= recallSeeds - 0.1,
      "one Lloyd step should not materially hurt recall")
    assert(ivf.size <= 50) // shape: still top-5 per query
  }

  test("bucketed near-dup (q27) agrees exactly with the brute-force pair scan") {
    val corpus = Similarity.plantedDupCorpus(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"), offset = 1000000L)
    val lsh = Similarity.cosineNearDupsLsh(corpus, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same corpus
    val n = corpus.withColumn("nrm", Similarity.l2norm(col("emb")))
    val a = n.select(col("vec_id").as("vec_a"), col("emb").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("vec_b"), col("emb").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Similarity.cosine(col("ea"), col("na"), col("eb"), col("nb")).as("c"))
      .filter(col("c") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute)
    // every original must pair with exactly its planted copy
    val nOrig = Tables.embeddings(spark, sf).count()
    assert(brute.size === nOrig.toInt)
    assert(brute.forall { case (x, y) => y === x + 1000000L })
  }

  test("brute-force kNN is symmetric-sane: scores within [-1,1], ranks dense") {
    val res = Similarity.knnBrute(Tables.embeddings(spark, sf), 10, 5).collect()
    assert(res.length === 50)
    assert(res.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("simhash banding is complete: equi-join pairs == brute-force Hamming<=3 pairs") {
    val docs = Tables.documents(spark, sf)
    val banded = Dedup.simhashNearDups(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // Brute force: all-pairs Hamming over the fingerprints (500 docs only).
    val fp = Dedup.simhash64(docs)
    val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute) // pigeonhole guarantee: no pair within radius missed
    // context: how much of the graded MinHash near-dup set this radius covers
    val minhash = Dedup.nearDuplicates(docs, 3, 192, 64, 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = (minhash & banded.map(t => (t._1, t._2))).size.toDouble / minhash.size
    info(f"Hamming<=3 covers $caught%.2f of jaccard>=0.7 pairs (short docs: ~100 features)")
  }

  test("simhash of a duplicated document is bit-identical (Hamming 0)") {
    val docs = Tables.documents(spark, sf).limit(3).select("doc_id", "text")
    val copies = docs.select((col("doc_id") + 5000).as("doc_id"),
      upper(concat(col("text"), lit("  "))).as("text")) // case/space noise only
    val fp = Dedup.simhash64(docs.union(copies)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until 3).foreach { i =>
      assert(fp(i.toLong) === fp(i.toLong + 5000))
    }
  }

  test("q62 SQL front door equals the Column-API q19 row for row") {
    val sql = SparkEntry.queries("q62_sql_frontdoor")(spark, sf)
    val api = SparkEntry.queries("q19_knn_brute")(spark, sf)
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
    // the SQL text really went through the extension registration: the
    // plan must contain the native VectorDot expression, not a UDF
    assert(sql.queryExecution.optimizedPlan.toString.contains("vector_dot"))
  }

  test("PQ finds planted near-identical vectors at rank 1") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.02f)).as("embedding"))
    // a scaled copy NORMALIZES to (nearly) the same unit vector -> its PQ
    // codes match the original's, its ADC distance to the query equals
    // the query's own self-distance -> guaranteed into the candidate
    // list, and the exact re-rank must surface it at rank 1
    val res = Similarity.knnPq(emb.union(planted), nQueries = 10, k = 5)
      .filter(col("neighbor_id") === col("query_id") + 10000)
    assert(res.count() === 10)
    assert(res.filter(col("rank") === 1).count() === 10)
  }

  test("PQ with exact re-rank: recall vs brute force on real data") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.knnBrute(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.knnPq(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"PQ recall@5 = $recall%.2f (candidates=64 of ~500, ADC prune + exact re-rank)")
    // the ADC prune keeps 64/500 = 13% of the corpus per query; the
    // re-rank is exact within candidates, so recall measures ONLY how
    // often a true top-5 neighbor survives the prune
    assert(recall >= 0.5, f"recall@5 $recall%.2f")
    assert(pq.size === brute.size)
  }

  test("SQ8: reconstruction error within half a quantization step per dimension") {
    val e = Similarity.prepared(Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("emb"))
    val enc = Similarity.sqEncode(e, Similarity.sqBounds(e))
    val rows = enc.select(col("emb"), col("codes"), col("mns"), col("spans"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Double](0)
      val codes = r.getSeq[Int](1)
      val mns = r.getSeq[Double](2)
      val spans = r.getSeq[Double](3)
      assert(codes.forall(c => c >= 0 && c <= 255))
      emb.indices.foreach { d =>
        val xhat = mns(d) + codes(d) * spans(d) / 255.0
        assert(math.abs(xhat - emb(d)) <= spans(d) / 510.0 + 1e-9,
          s"dim $d: ${emb(d)} vs $xhat (span ${spans(d)})")
      }
    }
  }

  test("SQ8 recall vs brute force stays near-exact (gentlest compression)") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.knnBrute(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity.knnSq8(emb, 10, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & sq).size.toDouble / brute.size
    info(f"SQ8 recall@5 = $recall%.2f (8-bit corpus, float queries)")
    // 8-bit per-dim quantization barely perturbs cosine ordering:
    // measured ~0.95+ on the near-random corpus; 0.8 catches a real
    // encode/dequant bug while riding out rank flips at tied scores
    assert(recall >= 0.8, f"SQ8 recall collapsed: $recall%.2f")
  }

  test("SQ8 codes are deterministic across runs") {
    def run() = Similarity.knnSq8(Tables.embeddings(spark, sf), 5, 3)
      .collect().map(_.toString).toSeq
    assert(run() === run())
  }

  test("PQ refuses a corpus smaller than kCent instead of silently misaligning codes") {
    // the dense codebook array indexes positionally by sub*k + cid, so a
    // short codebook (corpus < kCent distinct vectors) would misalign
    // every subspace past the first — must fail loudly at build time
    val tiny = Tables.embeddings(spark, sf).filter(col("vec_id") < 30)
    val ex = intercept[IllegalArgumentException] {
      Similarity.knnPq(tiny, nQueries = 2, k = 2).collect()
    }
    assert(ex.getMessage.contains("lower kCent"), ex.getMessage)
  }

  test("PQ codes are deterministic and 8 bytes per vector") {
    def run() = Similarity.knnPq(Tables.embeddings(spark, sf), 5, 3)
      .collect().map(_.toString).toSeq
    assert(run() === run())
  }

  test("plan guard: no corpus-sized frame meets a bare query_id window (salted tournament)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val emb = Tables.embeddings(spark, sf)
    // every ANN path's per-query cut must be the two-level tournament:
    // a window partitioned on query_id ALONE is legal only as stage 2,
    // i.e. above the per-(query, salt) survivor filter (__r1 <= n) —
    // that input is <= nSalts*k rows per query regardless of corpus size
    def assertTournament(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val bare = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(_.references.forall(_.name == "query_id")) => w
      }
      assert(bare.nonEmpty, s"$tag: expected a survivor-rank window")
      bare.foreach { w =>
        val survivorGated = w.child.collectFirst {
          case f: Filter if f.condition.references.exists(_.name == "__r1") => f
        }.nonEmpty
        assert(survivorGated,
          s"$tag: bare query_id window not fed by the per-salt survivor filter:\n$w")
      }
    }
    assertTournament(Similarity.knnBrute(emb, 10, 5), "knnBrute")
    assertTournament(Similarity.knnLsh(emb, 10, 5), "knnLsh")
    assertTournament(Similarity.knnIvf(emb, 10, 5, centroids = 32), "knnIvf")
    assertTournament(Similarity.knnPq(emb, 10, 5), "knnPq")
    assertTournament(Similarity.knnSq8(emb, 10, 5), "knnSq8")
  }
}
