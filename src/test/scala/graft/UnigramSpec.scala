package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Unigram}
import graft.sources.Tables

/** q143/q144/q145 — unigram-LM (SentencePiece-style) tokenizer. No
  * DuckDB oracle for learn/encode (an EM fixed point is not SQL), so
  * the gate is a full differential against [[UnigramReference]] — an
  * independently-structured plain-Scala implementation of the spec on
  * [[Unigram]]'s scaladoc: vocabulary piece-for-piece WITH bit-equal
  * log-probabilities, segmentation path-for-path, and corpus encode
  * id-for-id against a plain-Scala encoder that never touches the
  * engine's join plan. The q145 fertility bake-off is oracle-checked
  * (DuckDB recomputes from the staged segment tables). */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def wordFreq(): Seq[(String, Long)] =
    Bpe.wordFreqs(Tables.documents(spark, sf)).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("freq"))).toSeq

  // ---- planted corpus: the EM must find the obvious pieces ----

  test("a repetitive planted corpus learns multi-cp pieces that " +
    "compress below the all-singles segmentation") {
    val wf = Seq(("abab", 50L), ("ababab", 30L), ("abc", 20L), ("cc", 10L))
    val (pieces, segs) = Unigram.learnLocal(wf, vocabSize = 8)
    val vocab = pieces.map(_.piece).toSet
    assert(vocab.exists(p => p.length > 1 && p.contains("ab")),
      s"no multi-cp 'ab' piece survived pruning: $vocab")
    // the dominant word must not segment to singles
    val abab = segs.find(_.word == "abab").get
    assert(abab.syms.length < 4 + 1,
      s"'abab' segmented to singles: ${abab.syms}")
    // every word covered, marker last
    segs.foreach { s =>
      assert(s.syms.last === Bpe.EndOfWord)
      assert(s.syms.init.mkString === s.word)
    }
  }

  // ---- differential vs the independent reference ----

  test("trained vocabulary equals the independent reference EM " +
    "piece-for-piece with bit-equal log-probabilities (real corpus)") {
    val wf = wordFreq()
    val (pieces, segs) = Unigram.learnLocal(wf, Unigram.VocabSize)
    val (refPieces, refSegs) = UnigramReference.learn(wf, Unigram.VocabSize)
    assert(pieces.map(_.piece) === refPieces.map(_._1))
    assert(pieces.map(_.logp) === refPieces.map(_._2))
    assert(pieces.map(_.id) === (1 to pieces.size))
    // segmentations path-for-path
    val bySeg = segs.map(s => s.word -> s.syms).toMap
    assert(bySeg.keySet === refSegs.keySet)
    for ((w, path) <- refSegs) assert(bySeg(w) === path, s"word '$w'")
  }

  test("learning twice is identical (deterministic fixed order)") {
    val wf = wordFreq()
    val a = Unigram.learnLocal(wf, Unigram.VocabSize)
    val b = Unigram.learnLocal(wf, Unigram.VocabSize)
    assert(a._1 === b._1)
    assert(a._2.map(s => (s.word, s.syms)) === b._2.map(s => (s.word, s.syms)))
  }

  test("every training word is covered by the final vocabulary (no " +
    "OOV inside the training corpus)") {
    val wf = wordFreq()
    val (pieces, segs) = Unigram.learnLocal(wf, Unigram.VocabSize)
    val vocab = pieces.map(_.piece).toSet + Bpe.EndOfWord
    segs.foreach { s =>
      assert(s.syms.forall(vocab.contains),
        s"word '${s.word}' uses out-of-vocab pieces: ${s.syms}")
      assert(s.syms.init.mkString === s.word)
    }
    assert(segs.map(_.word).toSet === wf.filter(_._1.nonEmpty).map(_._1).toSet)
  }

  // ---- catalog entries ----

  test("q143 emits the staged vocabulary with dense ids and nano " +
    "log-probs") {
    val out = SparkEntry.queries("q143_unigram_learn")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= Unigram.VocabSize +
      256 /* singles can exceed a tiny target; not here */)
    assert(out.map(_.getAs[Int]("id")).toSeq === (1 to out.length))
    // nano form is floor(logp * 1e9): all negative (probabilities < 1)
    assert(out.forall(_.getAs[Long]("logp_nano") < 0L))
  }

  test("q144 corpus encode matches a plain-Scala encoder id-for-id " +
    "and round-trips through decode") {
    val wf = wordFreq()
    val (_, refSegs) = UnigramReference.learn(wf, Unigram.VocabSize)
    // reference id assignment: the (freq-weighted count DESC, piece
    // ASC) dense-id rule, computed without subwordVocab/subwordIds
    val freqOf = wf.toMap
    val counts = scala.collection.mutable.Map[String, Long]()
    for ((w, path) <- refSegs; p <- path)
      counts(p) = counts.getOrElse(p, 0L) + freqOf(w)
    val ids = counts.toSeq
      .sortBy { case (p, n) => (-n, p) }(
        Ordering.Tuple2(Ordering.Long, Bpe.Utf8Order))
      .zipWithIndex.map { case ((p, _), i) => p -> (i + 1) }.toMap
    // reference per-doc encode over the normalized text
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    def norm(t: String): Seq[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toSeq
    val expected = docs.map { case (id, text) =>
      val toks = norm(text)
      val idStr = toks.flatMap(w => refSegs.getOrElse(w,
          w.codePoints().toArray.toList.map(cp =>
            new String(Character.toChars(cp))) :+ Bpe.EndOfWord))
        .map(p => ids.getOrElse(p, 0)).mkString(" ")
      id -> idStr
    }.toMap
    val got = SparkEntry.queries("q144_unigram_encode")(spark, sf)
      .select("doc_id", "ids").as[(Long, String)].collect().toMap
    assert(got.keySet === expected.keySet)
    for ((id, s) <- expected) assert(got(id) === s, s"doc $id")

    // decode round trip over the full corpus
    val (_, segs) = Unigram.learnStaged(spark, sf)
    val idsDf = Bpe.subwordIds(Bpe.subwordVocab(segs))
    val enc = Bpe.encode(Tables.documents(spark, sf), segs, idsDf)
    val dec = Bpe.decode(enc, idsDf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, text) <- docs) {
      val n = norm(text).mkString(" ")
      assert(dec(id) === n, s"decode mismatch on doc $id")
    }
  }

  test("byte mode: reference-EM parity on the mapped domain, and " +
    "mapped pieces stay inside the byte alphabet") {
    val wf = wordFreq()
    val (pieces, segs) =
      Unigram.learnLocalWith(wf, Unigram.VocabSize, Unigram.byteMap,
        Bpe.ByteEndOfWord)
    // the reference EM trained on the MAPPED words must agree
    // piece-for-piece with bit-equal log-probs (the mapped domain is
    // just another alphabet to the spec)
    val mapped = wf.map { case (w, f) => (Unigram.byteMap(w), f) }
    val (refPieces, _) = UnigramReference.learn(mapped, Unigram.VocabSize)
    assert(pieces.map(_.piece) === refPieces.map(_._1))
    assert(pieces.map(_.logp) === refPieces.map(_._2))
    // segmentation keys are ORIGINAL words; syms live in the mapped
    // domain and reassemble to the mapped word
    segs.foreach { s =>
      assert(s.syms.last === Bpe.ByteEndOfWord)
      assert(s.syms.init.mkString === Unigram.byteMap(s.word), s.word)
    }
  }

  test("q150 byte encode: zero OOV and a universal decode round trip " +
    "on multi-script text the tokenizer never saw") {
    val (_, segs) = Unigram.learnStagedBytes(spark, sf)
    val ids = Bpe.subwordIds(Bpe.byteVocab(segs))
    // the corpus entry never emits id 0
    val enc = SparkEntry.queries("q150_unigram_byte_encode")(spark, sf)
    assert(enc.filter(col("ids").rlike("(^| )0( |$)")).count() === 0L,
      "byte-mode unigram encode emitted the OOV id")
    // hostile input: scripts, emoji, CJK the training corpus lacks
    val hostile = Seq(
      (1L, "Ζεύς ο θεός τοῦ κεραυνοῦ"),
      (2L, "深圳市 的 天气 很好"),
      (3L, "emoji 🌍🚀 mixed with ascii"),
      (4L, "русский текст тоже работает"))
    val hostileDf = hostile.toDF("doc_id", "text")
    val hEnc = Bpe.encodeBytes(hostileDf, segs, ids)
    assert(hEnc.filter(col("ids").rlike("(^| )0( |$)")).count() === 0L,
      "unseen scripts must fall back to base byte symbols, never OOV")
    val dec = Bpe.decodeBytes(hEnc, ids)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, text) <- hostile) {
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      assert(dec(id) === norm, s"byte round trip failed on doc $id")
    }
  }

  test("q145 bake-off is internally consistent and the oracle SQL is " +
    "registered after the entry runs (staged convention)") {
    val out = SparkEntry.queries("q145_tokenizer_compare")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val words = r.getAs[Long]("n_words")
      // each tokenizer emits at least one symbol per word (+ marker)
      assert(r.getAs[Long]("bpe_subwords") > words)
      assert(r.getAs[Long]("uni_subwords") > words)
      assert(r.getAs[Long]("n_chars") > 0L)
    }
    assert(SparkEntry.oracleSql.contains("q145_tokenizer_compare"))
    assert(Unigram.stagedOracleRoot.nonEmpty)
  }
}
