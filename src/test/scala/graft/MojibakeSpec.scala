package graft

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.Tables

/** q130 mojibake repair + q129 blocklist filter gates.
  *
  * The mojibake contract is differential TWICE over: the catalog oracle
  * proves repair ∘ corrupt == identity against DuckDB's rebuild of the
  * pre-corruption text, and this spec proves the detection/repair rules
  * match an INDEPENDENT plain-Java twin (CharsetDecoder in REPORT mode)
  * on planted and hostile strings — including the guard rows (CJK,
  * emoji, legitimate Latin-1 prose) where a wrong predicate would either
  * destroy text or raise under Spark 4's strict charset mode.
  */
class MojibakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Plain-Java twin of mojibakeIsBroken/mojibakeFix: same four rules,
    * independently expressed (String.getBytes + strict CharsetDecoder
    * instead of Catalyst encode/is_valid_utf8/decode). */
  private def twin(s: String): (Boolean, String) = {
    val candidate = s.forall(_ <= 0xFF)
    if (!candidate) (false, s)
    else {
      val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      try {
        val fixed = dec.decode(ByteBuffer.wrap(bytes)).toString
        val moji = fixed != s && fixed.codePointCount(0, fixed.length) <
          s.codePointCount(0, s.length)
        (moji, if (moji) fixed else s)
      } catch { case _: CharacterCodingException => (false, s) }
    }
  }

  /** What a Latin-1 mis-decode does to `s` — the corruption the fixture
    * stages, reproduced locally for planted cases. */
  private def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)

  private def engine(rows: Seq[String]): Seq[(String, Boolean, String)] = {
    import spark.implicits._
    rows.toDF("text")
      .select(col("text"),
        TextAnalysis.mojibakeIsBroken(col("text")).as("moji"),
        TextAnalysis.mojibakeFix(col("text")).as("fixed"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
  }

  test("planted mojibake is flagged and repaired exactly") {
    val originals = Seq("café", "fâst slöw ärger", "naïve — déjà vu", "ß ü ñ")
    val out = engine(originals.map(corrupt))
    originals.zip(out).foreach { case (orig, (bad, moji, fixed)) =>
      assert(bad !== orig, "corruption was a no-op — planted case is dead")
      assert(moji, s"corrupted '$orig' not flagged")
      assert(fixed === orig, s"repair of '$bad' gave '$fixed', wanted '$orig'")
    }
  }

  test("guard rows pass through untouched: CJK, emoji, Latin-1 prose, ASCII") {
    val keep = Seq(
      "日本語のテキスト",          // > U+00FF: not a candidate (and strict
      "emoji 😀 and 中文 mixed",   // encode would raise without the guard)
      "héllo wörld",               // legit Latin-1: re-encoding is invalid UTF-8
      "plain ascii text",          // round trip is identity
      "")                          // degenerate
    engine(keep).foreach { case (t, moji, fixed) =>
      assert(!moji, s"'$t' falsely flagged as mojibake")
      assert(fixed === t, s"'$t' mutated by the repair pass")
    }
  }

  test("engine matches the plain-Java twin on hostile and random Latin-1 strings") {
    val rnd = new scala.util.Random(41)
    val hostile = Seq(
      corrupt("café"), corrupt("😀 emoji"), corrupt("中文"),
      "Ã", "Ã©", "Â", "ÿþ", "a" * 10,
      "mixed ascii Ã© tail", "é alone", "ü" * 5) ++
      // random Latin-1 salad: mostly invalid UTF-8, occasionally valid
      (1 to 200).map(_ => (1 to rnd.nextInt(12) + 1)
        .map(_ => rnd.nextInt(0x100).toChar).mkString) ++
      // random genuine mojibake of random unicode text
      (1 to 100).map(_ => corrupt((1 to rnd.nextInt(8) + 1)
        .map(_ => (rnd.nextInt(0x2FF) + 0x20).toChar).mkString))
    val cleaned = hostile.filter(s => s.forall(c => c != 0)) // parquet/UTF8String NUL quirk aside
    val got = engine(cleaned)
    got.foreach { case (t, moji, fixed) =>
      val (twinMoji, twinFixed) = twin(t)
      assert(moji === twinMoji, s"flag mismatch on ${t.map(_.toInt).mkString(",")}")
      assert(fixed === twinFixed, s"repair mismatch on ${t.map(_.toInt).mkString(",")}")
    }
  }

  test("q130 flags exactly the enriched docs and restores their text") {
    val out = SparkEntry.queries("q130_mojibake_repair")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(3)))).toMap
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"),
        replace(replace(col("text"), lit("fast"), lit("fâst")),
          lit("slow"), lit("slöw")).as("t"))
      .select(col("doc_id"), col("t").rlike("[^\\x00-\\x7f]").as("moji"),
        md5(col("t").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out === expect)
    val flagged = out.values.count(_._1)
    assert(flagged > 0 && flagged < out.size,
      s"degenerate flag distribution: $flagged of ${out.size}")
  }

  test("blocklistHits counts boundary-anchored occurrences incl. adjacent dups") {
    import spark.implicits._
    val rows = Seq(
      ("slow slow slow", 3), ("slowly slower", 0), ("big dup slow", 3),
      ("  big\t\tdup  ", 2), ("BIG Big big", 3), ("", 0),
      ("bigdup big dup", 2), ("nothing here", 0))
    val got = rows.map(_._1).toDF("text")
      .select(col("text"),
        TextAnalysis.blocklistHits(col("text"), TextAnalysis.blocklist).as("h"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    rows.foreach { case (t, want) =>
      assert(got(t) === want, s"'$t' counted ${got(t)}, wanted $want")
    }
  }

  test("q129 keep decision follows the 12% density threshold") {
    val out = SparkEntry.queries("q129_blocklist_filter")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio === r.getInt(2).toDouble / r.getInt(1).toDouble)
      assert(r.getBoolean(4) === (ratio <= 0.12))
    }
    val kept = out.count(_.getBoolean(4))
    assert(kept > 0 && kept < out.length,
      s"degenerate keep distribution: $kept of ${out.length}")
  }
}
