package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AhoCorasick, MultiMatchStats}
import graft.operators.TextAnalysis
import graft.sources.Tables

/** q131 dictionary hit profile: the native Aho–Corasick expression is
  * gated three ways — classic-automaton semantics on crafted inputs,
  * term-for-term equality with the q129 regex path on the corpus, and a
  * 10⁴-term differential against plain-Scala token counting (the scale
  * where the regex path stops being an option and the automaton is the
  * only honest implementation). */
class MultiMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Plain-Scala twin of the padded token semantics: normalized
    * whitespace tokens, count dict occurrences + distinct dict terms. */
  private def twin(text: String, dict: Set[String]): (Long, Long) = {
    val toks = text.toLowerCase.trim.split("\\s+").toSeq
    val hits = toks.count(dict.contains)
    val distinct = toks.filter(dict.contains).distinct.size
    (hits.toLong, distinct.toLong)
  }

  test("classic Aho-Corasick semantics: overlaps, suffix outputs, duplicates") {
    val a1 = new AhoCorasick(Array("he", "she", "hers"))
    assert(a1.run("ushers") === ((3L, 3)))   // she, he (inside she), hers
    val a2 = new AhoCorasick(Array("a", "aa"))
    assert(a2.run("aaa") === ((5L, 2)))      // a x3, aa x2 (overlapping)
    val a3 = new AhoCorasick(Array(" slow "))
    assert(a3.run(" slow slow slow ") === ((3L, 1))) // shared separators count
    assert(a1.run("") === ((0L, 0)))
    assert(a1.run("zero dict words in this") === ((0L, 0)))
  }

  test("automaton == regex path term-for-term on the corpus blocklist") {
    val rows = Tables.documents(spark, sf)
      .select(
        TextAnalysis.blocklistHits(col("text"), TextAnalysis.blocklist).as("rx"),
        TextAnalysis.dictHitStats(col("text"), TextAnalysis.blocklist)
          .getField("n_hits").as("ac"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0).toLong === r.getLong(1)))
  }

  test("q131 matches the plain-Scala twin on every corpus document") {
    val dict = TextAnalysis.dictionary.toSet
    val got = SparkEntry.queries("q131_dict_hits")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(got(r.getLong(0)) === twin(r.getString(1), dict),
        s"doc ${r.getLong(0)}")
    }
    // non-degenerate: hit counts vary and distinct-terms stays <= |dict|
    assert(got.values.map(_._1).toSet.size > 3)
    assert(got.values.forall(_._2 <= dict.size))
  }

  test("10k-term dictionary: engine == twin (the beyond-regex scale)") {
    import spark.implicits._
    val terms = (0 until 10000).map(i => f"t$i%04d")
    val dict = terms.toSet
    val rnd = new scala.util.Random(17)
    // haystacks mixing dictionary terms (with adjacent repeats), noise
    // tokens, and near-miss tokens sharing the automaton's prefixes
    val docs = (1 to 60).map { _ =>
      (1 to rnd.nextInt(40) + 1).map { _ =>
        rnd.nextInt(4) match {
          case 0 => f"t${rnd.nextInt(10000)}%04d"
          case 1 => f"t${rnd.nextInt(10000)}%04dx"   // prefix near-miss
          case 2 => "noise" + rnd.nextInt(100)
          case _ => f"t${rnd.nextInt(30)}%04d"       // hot terms → repeats
        }
      }.mkString(" ")
    }
    val got = docs.toDF("text")
      .select(col("text"),
        TextAnalysis.dictHitStats(col("text"), terms).as("h"))
      .select(col("text"), col("h.n_hits"), col("h.n_terms"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach(d => assert(got(d) === twin(d, dict), s"on '${d.take(60)}'"))
    assert(docs.map(d => twin(d, dict)._1).sum > 100, "fixture too sparse")
  }

  test("multi_match_stats: interpreted==codegen and codegen-span participation") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val terms = Seq(" slow ", " dup ", " big ")
    def interp(s: String): (Long, Long) = {
      val r = MultiMatchStats(Literal.create(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType), terms)
        .eval(null).asInstanceOf[InternalRow]
      (r.getLong(0), r.getLong(1))
    }
    assert(interp(" slow slow big ") === ((3L, 2L)))
    assert(interp(" slowly dup ") === ((1L, 1L)))
    assert(interp("") === ((0L, 0L)))
    // codegen path on a table-backed scan agrees with interpreted
    val df = Tables.documents(spark, sf)
      .select(TextAnalysis.dictHitStats(col("text"), TextAnalysis.blocklist).as("h"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("multi_match_stats") && l.contains("*(")),
      s"multi_match_stats not inside a codegen stage:\n$plan")
  }
}
