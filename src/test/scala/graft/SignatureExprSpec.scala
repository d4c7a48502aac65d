package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashSignature
import graft.functions.MinHashSignature.minhash_signature
import graft.functions.SimHash64.simhash64

/** Native signature expressions (MinHashSignature, SimHash64):
  * reference-model parity, codegen participation, degenerate inputs. */
class SignatureExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Plain-Scala reference model of the affine MinHash family. */
  private def refMinhash(hs: Seq[Long], k: Int): Seq[Long] =
    (0 until k).map { i =>
      val a = 0x9E3779B97F4A7C15L * (2L * i + 1L)
      val b = 0xBF58476D1CE4E5B9L * i + 0x94D049BB133111EBL
      if (hs.isEmpty) Long.MaxValue else hs.map(h => a * h + b).min
    }

  /** Plain-Scala reference model of 64-bit SimHash. */
  private def refSimhash(hs: Seq[Long]): Long =
    (0 until 64).map { j =>
      val s = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
      if (s >= 0) 1L << j else 0L
    }.reduce(_ | _)

  test("minhash_signature matches the Scala reference model exactly") {
    import spark.implicits._
    val rows = Seq(
      Seq(42L, -7L, Long.MaxValue, 0L),
      Seq(1L),
      Seq(-1L, -2L, -3L, Long.MinValue),
      Seq.empty[Long])
    val out = rows.toDF("hs")
      .select(minhash_signature(col("hs"), 32).as("sig"))
      .as[Seq[Long]].collect()
    rows.zip(out).foreach { case (in, got) =>
      assert(got === refMinhash(in, 32), s"input $in")
    }
  }

  test("simhash64 matches the Scala reference model exactly") {
    import spark.implicits._
    val rows = Seq(
      Seq(42L, -7L, 12345L),
      Seq(0L),
      Seq(-1L),
      Seq(3L, 3L, 3L, 5L))
    val out = rows.toDF("hs").select(simhash64(col("hs")).as("fp"))
      .as[Long].collect()
    rows.zip(out).foreach { case (in, got) =>
      assert(got === refSimhash(in), s"input $in")
    }
  }

  test("ngram_xxhash64 is bit-identical to the composed multi-arg xxhash64 fold") {
    import graft.functions.NgramXxHash64.ngram_xxhash64
    val toks = operators.TextAnalysis.tokensFast(col("text"))
    // the composed (HOF) formulation with identical seed-chaining
    val composed = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => xxhash64((0 until 3).map(j => element_at(toks, i + lit(j + 1))): _*)))
      .otherwise(array().cast("array<bigint>"))
    val both = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(ngram_xxhash64(toks, 3).as("native"), composed.as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("srp_signatures matches the composed per-plane VectorDot form bit-exactly") {
    import graft.functions.SrpSignatures.srp_signatures
    import graft.operators.Similarity
    val e = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val native = e.select(col("vec_id"),
      srp_signatures(col("emb"), 4, 6, 64).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val composed = e.select(col("vec_id"),
      array((0 until 4).map(t => Similarity.srpSignature(col("emb"), t, 6, 64)): _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.keySet === composed.keySet)
    native.foreach { case (id, s) => assert(s === composed(id), s"vec $id") }
  }

  test("srp_signatures stays bit-identical to the composed form even on null elements") {
    import graft.functions.SrpSignatures.srp_signatures
    import graft.operators.Similarity
    import spark.implicits._
    // Null ELEMENTS are outside the documented contract (embeddings are
    // non-null), but the two forms must still agree rather than silently
    // diverge — both read elements primitively (null slot reads as 0.0
    // in unsafe layouts), so candidate buckets stay consistent.
    val rows = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0) ++
      Seq.fill(61)(java.lang.Double.valueOf(0.5))))
    val df = rows.toDF("vec_id", "emb")
    val native = df.select(srp_signatures(col("emb"), 4, 6, 64).as("s"))
      .collect().head.getSeq[Int](0)
    val composed = df.select(
        array((0 until 4).map(t => Similarity.srpSignature(col("emb"), t, 6, 64)): _*).as("s"))
      .collect().head.getSeq[Int](0)
    assert(native === composed)
  }

  test("native expressions are registered as SQL functions via GraftExtensions") {
    // SQL-only consumers must get the same expressions the Column API
    // builds — shape args are literals, results bit-match the Column path
    sources.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
      .createOrReplaceTempView("sqldocs")
    val viaSql = spark.sql("""
      SELECT doc_id,
             minhash_signature(ngram_xxhash64(split(lower(trim(text)), ' '), 3), 8) AS mh,
             simhash64(ngram_xxhash64(split(lower(trim(text)), ' '), 3)) AS sh,
             bottomk_ngram_md5(split(lower(trim(text)), ' '), 3, 4).fingerprint AS fp,
             repetition_stats(split(lower(trim(text)), ' ')).n_tokens AS nt
      FROM sqldocs ORDER BY doc_id""").collect()
    val toks = split(lower(trim(col("text"))), " ")
    val viaCols = sources.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
      .select(col("doc_id"),
        minhash_signature(operators.TextAnalysis.shingleHashArray(toks, 3), 8).as("mh"),
        simhash64(operators.TextAnalysis.shingleHashArray(toks, 3)).as("sh"),
        graft.functions.BottomKNgramMd5.bottomk_ngram_md5(toks, 3, 4)
          .getField("fingerprint").as("fp"),
        graft.functions.RepetitionStats.repetition_stats(toks)
          .getField("n_tokens").as("nt"))
      .orderBy("doc_id").collect()
    assert(viaSql.length === 50)
    viaSql.zip(viaCols).foreach { case (a, b) =>
      assert(a.getSeq[Long](1) === b.getSeq[Long](1))
      assert(a.getLong(2) === b.getLong(2))
      assert(a.getString(3) === b.getString(3))
      assert(a.getLong(4) === b.getLong(4))
    }
    // shape args must be literals — non-literal k fails with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), CAST(doc_id AS INT)) FROM sqldocs").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("full signature pipeline participates in whole-stage codegen") {
    // table-backed input: a local literal would constant-fold into a
    // LocalTableScan and bypass codegen entirely. This asserts the whole
    // scan -> ngram-hash -> signature path is ONE codegen stage (the
    // composed HOF form was CodegenFallback and ejected the projection).
    val hs = operators.TextAnalysis.shingleHashArray(
      operators.TextAnalysis.tokensFast(col("text")), 3)
    val df = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(minhash_signature(hs, 8).as("sig"), simhash64(hs).as("fp"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("minhash_signature") && l.contains("*(")),
      s"minhash_signature not inside a codegen stage:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("simhash64") && l.contains("*(")),
      s"simhash64 not inside a codegen stage:\n$plan")
  }

  test("interpreted eval agrees with codegen output") {
    // Evaluate the expression trees directly (interpreted path) against
    // the Dataset (codegen) results for the same inputs.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val input = Seq(7L, -13L, 99L)
    val lit = Literal.create(new GenericArrayData(input.toArray),
      ArrayType(LongType, containsNull = false))
    val sigInterp = MinHashSignature(lit, 16).eval(null)
      .asInstanceOf[ArrayData].toLongArray.toSeq
    assert(sigInterp === refMinhash(input, 16))
    val fpInterp = graft.functions.SimHash64(lit).eval(null).asInstanceOf[Long]
    assert(fpInterp === refSimhash(input))
  }

  test("bottomk_ngram_md5 matches the composed distinct+md5+sort+slice form") {
    import graft.functions.BottomKNgramMd5.bottomk_ngram_md5
    val toks = operators.TextAnalysis.tokensFast(col("text"))
    val sh = array_distinct(operators.TextAnalysis.shingleArray(toks, 3))
    val both = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(size(toks) >= 3)
      .select(
        bottomk_ngram_md5(toks, 3, 4).as("fp"),
        concat_ws(",", slice(array_sort(transform(sh, s => md5(s))), 1, 4)).as("c_fp"),
        size(sh).cast("long").as("c_n"))
    assert(both.filter(col("fp.fingerprint") =!= col("c_fp") ||
      col("fp.n_shingles") =!= col("c_n")).count() === 0)
  }

  test("bottomk_ngram_md5 handles degenerate inputs and stays codegen'd") {
    import graft.functions.BottomKNgramMd5
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: String*) = Literal.create(
      new GenericArrayData(ts.map(UTF8String.fromString).toArray),
      ArrayType(StringType, containsNull = false))
    // fewer tokens than n -> empty fingerprint, zero shingles
    val empty = BottomKNgramMd5(arr("a", "b"), 3, 4).eval(null).asInstanceOf[InternalRow]
    assert(empty.getUTF8String(0).toString === "")
    assert(empty.getLong(1) === 0L)
    // fewer distinct shingles than k -> all of them, in digest order
    val one = BottomKNgramMd5(arr("a", "b", "c"), 3, 4).eval(null).asInstanceOf[InternalRow]
    assert(one.getUTF8String(0).numChars === 32)
    assert(one.getLong(1) === 1L)
    // duplicate shingles collapse ("a b a b a" has shingles {a b a, b a b})
    val dup = BottomKNgramMd5(arr("a", "b", "a", "b", "a"), 3, 4)
      .eval(null).asInstanceOf[InternalRow]
    assert(dup.getLong(1) === 2L)
    // codegen participation on a table-backed scan
    val df = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.functions.BottomKNgramMd5.bottomk_ngram_md5(
        operators.TextAnalysis.tokensFast(col("text")), 3, 4).as("fp"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("bottomk_ngram_md5") && l.contains("*(")),
      s"bottomk_ngram_md5 not inside a codegen stage:\n$plan")
  }

  test("repetition_stats matches the composed explode+aggregate form and stays codegen'd") {
    import graft.functions.RepetitionStats.repetition_stats
    val toks = operators.TextAnalysis.tokensFast(col("text"))
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.filter(size(toks) >= 2)
      .select(col("doc_id"), repetition_stats(toks).as("r"))
      .select(col("doc_id"), col("r.n_tokens"), col("r.n_distinct"),
        col("r.top_bigram"), col("r.tot_bigrams"))
    val composed = docs
      .select(col("doc_id"), explode(
        operators.TextAnalysis.shingleArray(toks, 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top"), sum("c").as("tot"))
      .join(docs.select(col("doc_id"), size(toks).cast("long").as("n"),
        size(array_distinct(toks)).cast("long").as("nd")), Seq("doc_id"))
    val joined = native.join(composed, Seq("doc_id"))
    assert(joined.count() === native.count())
    assert(joined.filter(col("n_tokens") =!= col("n") ||
      col("n_distinct") =!= col("nd") || col("top_bigram") =!= col("top") ||
      col("tot_bigrams") =!= col("tot")).count() === 0)
    native.collect()
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("repetition_stats") && l.contains("*(")),
      s"repetition_stats not inside a codegen stage:\n$plan")
  }

  test("duplicate shingles do not change either signature's min/set semantics") {
    import spark.implicits._
    val base = Seq(11L, 22L, 33L)
    val dup = base ++ base ++ base.take(1)
    val df = Seq(base, dup).toDF("hs")
      .select(minhash_signature(col("hs"), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(df(0) === df(1)) // min is idempotent to duplicates
  }

  // ---- deflate_stats (q107) ----

  /** Driver-side java.util.zip reference: raw DEFLATE, level 6 — the
    * expression's exact contract. */
  private def refDeflate(s: String): (Long, Long) = {
    val bytes = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    d.end()
    (bytes.length.toLong, out)
  }

  test("deflate_stats matches the java.util.zip reference on the corpus") {
    import spark.implicits._
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = docs
      .select(col("text"),
        graft.functions.DeflateStats.deflate_stats(col("text")).as("ds"))
      .select(col("text"), col("ds.n_bytes"), col("ds.n_deflate"))
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (text, nb, nd) =>
      assert((nb, nd) === refDeflate(text), s"mismatch on ${text.take(40)}")
    }
  }

  test("deflate_stats: interpreted==codegen, degenerate inputs, ordering, codegen span") {
    import graft.functions.DeflateStats
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def interp(s: String): (Long, Long) = {
      val r = DeflateStats(Literal.create(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null).asInstanceOf[InternalRow]
      (r.getLong(0), r.getLong(1))
    }
    // interpreted path == the driver-side reference (and so, with the
    // corpus test above, == the codegen path)
    Seq("", "a", "ab" * 500, "the quick brown fox", "é漢字 mixed")
      .foreach(s => assert(interp(s) === refDeflate(s), s"on ${s.take(20)}"))
    // empty input: zero bytes in, a constant empty-stream frame out
    assert(interp("")._1 === 0L)
    // the quality-signal ordering the cut relies on: repetition
    // compresses below prose, prose below high-entropy salad
    val rep = interp("lorem ipsum " * 200)
    val prose = interp(("the quick brown fox jumps over the lazy dog and " +
      "every sentence differs a little bit more 0123456789 ") * 24)
    val rnd = {
      val r = new scala.util.Random(7)
      interp(Seq.fill(2400)(r.nextPrintableChar()).mkString)
    }
    def ratio(p: (Long, Long)) = p._2.toDouble / p._1.toDouble
    assert(ratio(rep) < ratio(prose) && ratio(prose) < ratio(rnd),
      s"${ratio(rep)} / ${ratio(prose)} / ${ratio(rnd)}")
    // whole-stage-codegen participation on a table-backed scan
    val df = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(DeflateStats.deflate_stats(col("text")).as("ds"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("deflate_stats") && l.contains("*(")),
      s"deflate_stats not inside a codegen stage:\n$plan")
  }
}
