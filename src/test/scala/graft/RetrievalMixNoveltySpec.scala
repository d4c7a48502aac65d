package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Sampling, Vocab}
import graft.sources.Tables

/** Round-7 operators: hybrid RRF retrieval (q85), temperature-scaled
  * mixture sampling (q86), cross-document bigram novelty (q87). Each is
  * oracle-gated in the catalog; these tests pin the semantic properties
  * the oracle's hash compare can't articulate (fusion arithmetic, the
  * variable-quota tournament's equivalence to a bare window, the
  * uniqueness bookkeeping) plus the bounded-plan claims.
  */
class RetrievalMixNoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  // ---- q85 hybrid RRF ----

  test("RRF score is exactly 1/(K+kw)+1/(K+vec) with absent lists scoring 0") {
    val fused = Retrieval.hybridRrf(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf),
      Seq("spark", "join", "filter"), queryId = 7L, nCand = 50, k = 20).collect()
    assert(fused.length === 20)
    fused.foreach { r =>
      val kw = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val vec = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(kw.isDefined || vec.isDefined)
      val expect = kw.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(3) === expect, s"row $r")
    }
    // fused order is rrf DESC with doc_id tiebreak — verify monotone
    val scores = fused.map(_.getDouble(3)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("a doc ranked well by BOTH modalities outranks one ranked by a single modality at similar depth") {
    // structural property of RRF: 1/(60+r1)+1/(60+r2) for moderate ranks
    // beats 1/(60+r) for any single rank r >= min(r1,r2)
    val both = 1.0 / 61 + 1.0 / 70
    val single = 1.0 / 61
    assert(both > single)
  }

  test("keyword and vector rank lists are dense 1..n and deterministic") {
    val kw = Retrieval.keywordRanks(
      Tables.documents(spark, sf), Seq("spark", "join", "filter"), nCand = 50)
      .orderBy("kw_rank").collect()
    assert(kw.map(_.getInt(1)).toSeq === (1 to kw.length))
    val again = Retrieval.keywordRanks(
      Tables.documents(spark, sf), Seq("spark", "join", "filter"), nCand = 50)
      .orderBy("kw_rank").collect()
    assert(kw.map(_.toString).toSeq === again.map(_.toString).toSeq)
    val vec = Retrieval.vectorRanks(
      Tables.embeddings(spark, sf), queryId = 7L, nCand = 50)
      .orderBy("vec_rank").collect()
    assert(vec.map(_.getInt(1)).toSeq === (1 to 50))
    assert(!vec.exists(_.getLong(0) == 7L), "query vector must not rank itself")
  }

  test("hybrid plan cuts with TakeOrdered before any rank window") {
    // the corpus-sized frames must exit through TakeOrdered limits; the
    // row_number windows may only see post-limit candidate frames
    val plan = Retrieval.hybridRrf(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf),
      Seq("spark", "join"), queryId = 7L, nCand = 50, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject cuts in:\n$plan")
  }

  // ---- q86 temperature mix ----

  test("temperature mix hits its integer quotas exactly and flattens the distribution") {
    val docs = Tables.documents(spark, sf).select("lang", "doc_id")
    val mixed = Sampling.temperatureMix(docs, col("lang"), col("doc_id"), total = 200L)
    val perGroup = mixed.groupBy("lang")
      .agg(count(lit(1)).as("picked"), max("target").as("target"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    perGroup.foreach { case (lang, picked, target) =>
      assert(picked === math.min(target, sizes(lang)),
        s"$lang picked $picked of target $target (group size ${sizes(lang)})")
      val w = math.sqrt(sizes(lang).toDouble).toLong
      val sumW = sizes.values.map(n => math.sqrt(n.toDouble).toLong).sum
      assert(target === 200L * w / sumW, s"$lang target")
    }
    // flattening: quota ratio across groups must not exceed the size ratio
    val e = perGroup.map(_._3)
    val szs = perGroup.map { case (l, _, _) => sizes(l) }
    assert(e.max.toDouble / e.min.toDouble <= szs.max.toDouble / szs.min.toDouble + 1e-9)
  }

  test("temperature-mix overflow guard is integral-exact at the boundary") {
    import spark.implicits._
    // 9 docs in one group -> w = floor(sqrt(9)) = 3, sumW = 3.
    val docs = (1L to 9L).map(i => ("en", i)).toDF("lang", "doc_id")
    // SAFE boundary input the old DOUBLE-division guard raised on
    // spuriously: 3 * total fits in a Long, but double(Long.MaxValue)/3
    // rounds below total. Must NOT raise; quota = total*3 div 3 = total,
    // clamped to the 9 available rows.
    val safeTotal = 3074457345618258500L
    assert(3L * safeTotal > 0L) // sanity: really no overflow
    val picked = Sampling.temperatureMix(docs, col("lang"), col("doc_id"),
      total = safeTotal).count()
    assert(picked === 9L)
    // genuine overflow one notch past the exact floor must raise
    val ex = intercept[Exception] {
      Sampling.temperatureMix(docs, col("lang"), col("doc_id"),
        total = Long.MaxValue / 3 + 1).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("overflows BIGINT")),
      s"expected the overflow error, got: ${messages(ex).mkString(" | ")}")
  }

  test("variable-quota salted tournament equals the bare-window reference") {
    val docs = Tables.documents(spark, sf).select("lang", "doc_id")
    val got = Sampling.temperatureMix(docs, col("lang"), col("doc_id"), total = 200L)
      .select("lang", "doc_id", "pick").orderBy("lang", "pick")
      .collect().map(_.toString).toSeq
    // reference: plain window over each full group, same keys
    import org.apache.spark.sql.expressions.Window
    val targets = Sampling.temperatureMix(docs, col("lang"), col("doc_id"), total = 200L)
      .select("lang", "target").distinct()
    val ref = docs
      .withColumn("pick", row_number().over(
        Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("int"))
      .join(targets, Seq("lang"))
      .filter(col("pick") <= col("target"))
      .select("lang", "doc_id", "pick").orderBy("lang", "pick")
      .collect().map(_.toString).toSeq
    assert(got === ref)
  }

  // ---- q87 bigram novelty ----

  test("bigram novelty counts distinct and corpus-unique bigrams correctly") {
    val docs = Seq(
      (1L, "a b c"),   // bigrams {a b, b c}
      (2L, "a b d"),   // bigrams {a b, b d}
      (3L, "x"),       // no bigrams
      (4L, "p q p q")  // bigrams {p q, q p} (distinct within doc)
    ).toDF("doc_id", "text")
    val got = Vocab.bigramNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // "a b" df=2 (docs 1,2); "b c","b d","p q","q p" unique
    assert(got === Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 0L, 0L), (4L, 2L, 2L)))
  }

  // ---- q88 source overlap ----

  test("source overlap counts shared distinct n-grams per ordered pair") {
    val docs = Seq(
      (1L, "the quick brown fox", "a"),
      (2L, "the quick brown dog", "b"),  // shares "the quick brown" with a
      (3L, "the quick brown fox", "c"),  // shares both fox-grams with a, brown-gram with b
      (4L, "entirely different words here", "d")
    ).toDF("doc_id", "text", "source")
    val got = operators.Decontamination.sourceOverlap(docs, n = 3).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // grams: a={tqb, qbf}, b={tqb, qbd}, c={tqb, qbf}, d={edw, dwh}
    assert(got === Map(("a", "b") -> 1L, ("a", "c") -> 2L, ("b", "c") -> 1L))
  }

  test("source overlap set form equals the self-join formulation") {
    val docs = Tables.documents(spark, sf)
    val got = operators.Decontamination.sourceOverlap(docs, n = 3)
      .collect().map(_.toString).toSeq
    val w = operators.TextAnalysis.tokens(col("text"))
    val sh = docs.select(col("source"),
        explode(array_distinct(operators.TextAnalysis.shingleArray(w, 3))).as("gram"))
      .distinct()
    val ref = sh.as("a").join(sh.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("src_a", "src_b")
      .collect().map(_.toString).toSeq
    assert(got === ref)
    assert(got.nonEmpty)
  }

  // ---- q90 label centroid sums ----

  test("label centroid sums equal an exact BigDecimal reference per component") {
    val emb = Tables.embeddings(spark, sf)
    val got = operators.Similarity.labelCentroidSums(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDecimal(2), r.getLong(3)))).toMap
    val raw = emb.select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val ref = raw.flatMap { case (l, v) =>
      v.zipWithIndex.map { case (x, i) =>
        // Spark's double→decimal cast goes through the SHORTEST decimal
        // string (BigDecimal.valueOf / Double.toString), NOT the exact
        // binary expansion — mirror that, or digits 17-18 diverge
        ((l, i), java.math.BigDecimal.valueOf(x.toDouble)
          .setScale(18, java.math.RoundingMode.HALF_UP)) }
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.map(_._2).reduce(_ add _), xs.length.toLong) }
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (sum, n)) =>
      val (rSum, rN) = ref(k)
      assert(n === rN, s"count at $k")
      assert(sum.compareTo(rSum) === 0,
        s"component sum at $k: got $sum expected $rSum")
    }
  }

  test("novelty bookkeeping: sum of n_unique equals the global df=1 bigram count") {
    val docs = Tables.documents(spark, sf)
    val res = Vocab.bigramNovelty(docs)
    val sums = res.agg(sum("n_unique"), sum("n_bigrams")).head()
    val w = operators.TextAnalysis.tokens(col("text"))
    val global = docs.select(col("doc_id"),
        explode(when(size(w) >= 2, array_distinct(zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b)))).otherwise(array())).as("bg"))
      .groupBy("bg").agg(countDistinct("doc_id").as("df"))
    val uniqueTotal = global.filter(col("df") === 1).count()
    val pairTotal = global.agg(sum("df")).head().getLong(0)
    assert(sums.getLong(0) === uniqueTotal)
    assert(sums.getLong(1) === pairTotal)
    assert(uniqueTotal > 0)
  }
}
