package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Text-pipeline operator tests: dedup (exact + MinHash-LSH), shingling,
  * language-ID — on sf0.001 plus synthetic fixtures. */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("exact dedup collapses normalization-equivalent copies") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // Inject noisy copies: same content modulo case/whitespace, new ids.
    val noisy = docs.limit(5).select(
      (col("doc_id") + 100000).as("doc_id"),
      upper(concat(lit("  "), regexp_replace(col("text"), " ", "   "))).as("text"))
    val all = docs.union(noisy)
    val deduped = all
      .select(col("doc_id"), sha2(TextAnalysis.norm(col("text")), 256).as("h"))
      .groupBy("h").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
    assert(deduped.count() === 500) // the 5 noisy copies collapsed
    assert(deduped.filter(col("n_copies") === 2).count() === 5)
    // survivors are the original (lowest) ids
    assert(deduped.filter(col("doc_id") >= 100000).count() === 0)
  }

  test("MinHash-LSH near-dup matches brute-force shingle-join exactly at tau=0.7") {
    val docs = Tables.documents(spark, sf)
    val lsh = Dedup.nearDuplicates(docs, n = 3, k = 192, b = 64, r = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Brute force: every pair sharing >= 1 shingle, exact Jaccard.
    val sh = TextAnalysis.shingles(docs, 3)
    val allPairs = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val brute = Dedup.verifyJaccard(allPairs, sh)
      .filter(col("jaccard") >= 0.7).orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(brute.nonEmpty) // the corpus has planted near-dups
    assert(lsh.toSeq === brute.toSeq) // recall AND precision = 1 at this b,r
  }

  test("prefix-filter Jaccard join matches brute force pairs at tau=0.7 (hash-set Jaccard)") {
    val docs = Tables.documents(spark, sf)
    val pf = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Brute force over string shingle sets (the oracle's formulation).
    val sh = TextAnalysis.shingles(docs, 3)
    val allPairs = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val brute = Dedup.verifyJaccard(allPairs, sh)
      .filter(col("jaccard") >= 0.7).orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(brute.nonEmpty)
    assert(pf.toSeq === brute.toSeq) // lossless: recall AND precision = 1
  }

  test("banded LSH produces no candidates for dissimilar docs (no all-pairs blowup)") {
    val docs = Tables.documents(spark, sf)
    val nCand = Dedup.candidatePairs(
      Dedup.bands(Dedup.minhashSignatures(docs, 3, 192), b = 64, r = 3)).count()
    // 500 docs -> 124,750 possible pairs; candidates must stay near the
    // true near-dup count, not the quadratic blowup.
    assert(nCand < 500)
  }

  test("shingleArray produces overlapping word n-grams") {
    val out = Seq("the quick brown fox jumps")
      .toDF("text")
      .select(TextAnalysis.shingleArray(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .as[Seq[String]].head()
    assert(out === Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    val short = Seq("one two").toDF("text")
      .select(TextAnalysis.shingleArray(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("language-ID identifies natural-language samples by stopword profile") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it is a good day for the walk"),
      ("fr", "le chat est sur la table et les enfants de la maison sont la"),
      ("de", "der hund ist nicht mit der katze und das haus von dem mann"),
      ("es", "el perro y el gato de la casa es un animal que come y duerme"),
      ("zh", "今天天气很好我们去公园散步吧"))
      .toDF("expected", "text")
    val t = TextAnalysis.tokens(col("text"))
    val n = TextAnalysis.norm(col("text"))
    val pred = samples.select(
      col("expected"),
      when(TextAnalysis.cjkChars(n).cast("double") / length(n) > 0.3, "zh")
        .when(TextAnalysis.stopwordHits(t, "en") >= TextAnalysis.stopwordHits(t, "de") &&
          TextAnalysis.stopwordHits(t, "en") >= TextAnalysis.stopwordHits(t, "es") &&
          TextAnalysis.stopwordHits(t, "en") >= TextAnalysis.stopwordHits(t, "fr"), "en")
        .when(TextAnalysis.stopwordHits(t, "de") >= TextAnalysis.stopwordHits(t, "es") &&
          TextAnalysis.stopwordHits(t, "de") >= TextAnalysis.stopwordHits(t, "fr"), "de")
        .when(TextAnalysis.stopwordHits(t, "es") >= TextAnalysis.stopwordHits(t, "fr"), "es")
        .otherwise("fr").as("pred"))
    assert(pred.filter(col("expected") =!= col("pred")).count() === 0)
  }

  test("BPE-ish pretokenizer splits contractions, digits and punctuation runs") {
    val pat = "'(s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"
    val counts = Seq(
      ("it's 2024, don't panic!!", 8), // it|'s| 2024|,| don|'t| panic|!!
      ("hello world", 2),
      ("a1b2", 4))
      .toDF("text", "expected")
      .select(col("expected"),
        size(regexp_extract_all(TextAnalysis.norm(col("text")), lit(pat), lit(0))).as("got"))
    assert(counts.filter(col("expected") =!= col("got")).count() === 0)
  }

  test("fingerprint is stable under formatting noise") {
    val fp = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.shingles(df, 3).groupBy("doc_id")
        .agg(concat_ws(",", slice(sort_array(collect_set(md5(col("shingle")))), 1, 4)).as("fp"))
    val base = Tables.documents(spark, sf).select("doc_id", "text").limit(20)
    val noisy = base.select(col("doc_id"),
      upper(regexp_replace(col("text"), " ", "  ")).as("text"))
    val joined = fp(base).as("x").join(fp(noisy).as("y"), "doc_id")
      .filter(col("x.fp") =!= col("y.fp"))
    assert(joined.count() === 0)
  }

  test("PII scrub redacts the planted email and phone in every document") {
    val out = SparkEntry.queries("q37_pii_scrub")(spark, sf)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1).count() === 0)
    // hashes are 64 lowercase hex chars (sha-256 of the scrubbed text)
    assert(out.filter(not(col("scrub_hash").rlike("^[0-9a-f]{64}$"))).count() === 0)
  }

  test("repetition signals are valid ratios and detect a planted boilerplate doc") {
    val out = SparkEntry.queries("q38_repetition")(spark, sf)
    assert(out.filter(col("dup_token_ratio") < 0 || col("dup_token_ratio") > 1 ||
      col("top_bigram_ratio") <= 0 || col("top_bigram_ratio") > 1).count() === 0)
    // a doc that is one phrase repeated maxes both signals — computed with
    // the operator's own helpers over a planted frame
    import spark.implicits._
    val planted = Seq((1L, ("spam ham " * 50).trim)).toDF("doc_id", "text")
    val toks = graft.operators.TextAnalysis.tokensFast(col("text"))
    val grams = planted
      .select(col("doc_id"), explode(
        graft.operators.TextAnalysis.shingleArray(toks, 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top"), sum("c").as("tot"))
      .select((col("top").cast("double") / col("tot").cast("double")).as("ratio"))
      .head().getDouble(0)
    assert(grams > 0.49, s"repeated phrase should concentrate bigrams, got $grams")
  }
}
