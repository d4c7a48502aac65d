package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe
import graft.sources.Tables

/** q102/q103 — distributed BPE merge learning + subword encoding. No
  * DuckDB oracle exists (the per-round argmax is not a recursive CTE),
  * so the gate is a full differential against a plain single-node Scala
  * reference implementation of Sennrich et al. 2016: merge-for-merge
  * equality of the learned rules and id-for-id equality of the encoded
  * corpus, on a planted corpus with hand-checkable first merges AND on
  * the real sf0.001 table (the q80 pattern). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  import BpeReference.{refTokens, refLearn, refEncode, refWordFreq}

  // ---- fold-expression merge semantics ----

  test("applyMerge is the greedy left-to-right non-overlapping pass") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("a", "a", "a", "a")),
      (3L, Seq("x", "a", "b", "a", "b")),
      (4L, Seq("a")),
      (5L, Seq[String]())
    ).toDF("id", "syms")
    val aa = df.select(col("id"), Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(aa(1L) === Seq("aa", "a"))
    assert(aa(2L) === Seq("aa", "aa"))
    assert(aa(4L) === Seq("a"))
    assert(aa(5L) === Seq())
    val ab = df.select(col("id"), Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(ab(3L) === Seq("x", "ab", "ab"))
  }

  // ---- planted corpus: hand-checkable + differential ----

  private def planted = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest newest newest newest newest"),
    (3L, "widest widest widest new new"),
    (4L, "")
  )

  test("planted corpus: first merge is hand-derivable and the chain matches the reference") {
    val docs = planted.toDF("doc_id", "text")
    val (rules, words) = Bpe.learn(docs, merges = 12)
    // 'e s' appears in newest(6) + widest(3) = 9 — the max first pair
    // ('es t' after it, etc.); hand-check the head, differential the rest
    assert(rules.head.left === "e" && rules.head.right === "s" &&
      rules.head.pair_count === 9L)
    val (refRules, refSegs) = refLearn(refWordFreq(planted), 12)
    assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count)) === refRules)
    val got = words.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(got.view.mapValues(_.toVector).toMap === refSegs)
    words.unpersist()
  }

  test("planted corpus: encode matches the reference id-for-id (empty doc included)") {
    val docs = planted.toDF("doc_id", "text")
    val (_, words) = Bpe.learn(docs, merges = 12)
    val enc = Bpe.encode(docs, words.select("word", "syms"),
        Bpe.subwordIds(Bpe.subwordVocab(words)))
      .select("doc_id", "n_words", "n_subwords", "ids")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val wf = refWordFreq(planted)
    val (_, refSegs) = refLearn(wf, 12)
    assert(enc === refEncode(planted, refSegs, wf))
    words.unpersist()
  }

  test("wordTable bounds the driver collect: top-maxWords by (freq DESC, " +
      "word ASC), deterministic, and the full-table default is a no-op " +
      "at test scale") {
    val docs = Seq(
      (1L, "b b b c c a a a a"),
      (2L, "c d a"),
      (3L, "e")).toDF("doc_id", "text")
    // a=5, c=3, b=3, d=1, e=1 — cap 3 keeps the head, ties on word ASC
    val capped = Bpe.wordTable(docs, maxWords = 3)
    assert(capped === Seq(("a", 5L), ("b", 3L), ("c", 3L)))
    // the default cap admits every word of a test-scale corpus — the
    // staged tokenizers are byte-identical with or without the bound
    val full = Bpe.wordTable(docs)
    assert(full.size === 5)
    assert(full.toMap === Map("a" -> 5L, "b" -> 3L, "c" -> 3L,
      "d" -> 1L, "e" -> 1L))
    assert(Bpe.wordTable(Tables.documents(spark, sf)).size
      < Bpe.MaxWordTable,
      "fixture corpus hit the cap — the no-op-at-test-scale claim broke")
  }

  test("merge learning stops when no pair clears minCount") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // 'a b' count 2, 'b </w>' count 2, 'c d'/'d </w>' count 1: with
    // minCount=3 nothing qualifies and the rule list is empty
    val (rules, words) = Bpe.learn(docs, merges = 10, minCount = 3L)
    assert(rules.isEmpty)
    words.unpersist()
  }

  // ---- real corpus differential (sf0.001) ----

  test("sf0.001: learned merges and encoded ids equal the plain-Scala reference") {
    val docs = Tables.documents(spark, sf)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val wf = refWordFreq(local)
    val (refRules, refSegs) = refLearn(wf, 32)
    val (rules, words) = Bpe.learn(docs, merges = 32)
    assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count)) === refRules)
    val enc = Bpe.encode(docs, words.select("word", "syms"),
        Bpe.subwordIds(Bpe.subwordVocab(words)))
      .select("doc_id", "n_words", "n_subwords", "ids")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(enc === refEncode(local, refSegs, wf))
    words.unpersist()
  }

  // ---- O(1)-job production path (q102/q104 round-10 gates) ----

  test("learnCollected (driver loop) equals the distributed loop and the reference, planted + sf0.001") {
    Seq(planted.toDF("doc_id", "text") -> planted,
        Tables.documents(spark, sf) ->
          Tables.documents(spark, sf).select("doc_id", "text")
            .as[(Long, String)].collect().toSeq).foreach { case (docs, local) =>
      val wf = refWordFreq(local)
      val (refRules, refSegs) = refLearn(wf, 32)
      val (rules, segs) = Bpe.learnCollected(docs, merges = 32)
      assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count)) === refRules)
      val got = segs.select("word", "syms").as[(String, Seq[String])]
        .collect().toMap.view.mapValues(_.toVector).toMap
      assert(got === refSegs)
    }
  }

  test("sf0.1 (the catalog tier): merges, segmentations and encoded ids equal the reference") {
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val wf = refWordFreq(local)
    val (refRules, refSegs) = refLearn(wf, 32)
    val (rules, segs) = Bpe.learnCollected(docs, merges = 32)
    assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count)) === refRules)
    val enc = Bpe.encode(docs, segs.select("word", "syms"),
        Bpe.subwordIds(Bpe.subwordVocab(segs)))
      .select("doc_id", "n_words", "n_subwords", "ids")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(enc === refEncode(local, refSegs, wf))
    spark.catalog.clearCache()
  }

  test("q104: 1,024 vocab-budget merges on the lake-wide corpus equal the reference (sf0.01), early-stop parity at sf0.001") {
    // sf0.01 — the CORRECTNESS tier: the budget is actually filled
    val dir = "/root/testdata/sf0.01"
    val wf01 = Bpe.unionTextCorpus(spark, dir)
      .select("text").as[String].collect().toSeq
      .flatMap(BpeReference.refTokens)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val (refRules, refSegs) = refLearn(wf01, 1024, minCount = 1L)
    assert(refRules.size === 1024, "fixture no longer sustains the budget")
    val (rules, segs) =
      Bpe.learnCollected(Bpe.unionTextCorpus(spark, dir), 1024, minCount = 1L)
    assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count)) === refRules)
    assert(segs.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap.view.mapValues(_.toVector).toMap === refSegs)
    // sf0.001 — the corpus exhausts below the budget: the early stop
    // must agree rule-for-rule too
    val wf001 = Bpe.unionTextCorpus(spark, sf)
      .select("text").as[String].collect().toSeq
      .flatMap(BpeReference.refTokens)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val (refR2, _) = refLearn(wf001, 1024, minCount = 1L)
    assert(refR2.size < 1024)
    val (rules2, _) =
      Bpe.learnCollected(Bpe.unionTextCorpus(spark, sf), 1024, minCount = 1L)
    assert(rules2.map(r => (r.rank, r.left, r.right, r.pair_count)) === refR2)
  }

  test("job count is O(1) in the merge count: 1,024 merges cost exactly as many Spark jobs as 32") {
    def jobsFor(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val corpus = Bpe.unionTextCorpus(spark, sf)
    val j32 = jobsFor("bpe-jobs-32") {
      assert(Bpe.learnCollected(corpus, 32, minCount = 1L)._1.size === 32)
    }
    val j1024 = jobsFor("bpe-jobs-1024") {
      assert(Bpe.learnCollected(corpus, 1024, minCount = 1L)._1.size > 32)
    }
    assert(j1024 === j32,
      s"merge count leaked into the Spark-job count: $j32 jobs at 32 merges, $j1024 at 1024")
    assert(j32 <= 4, s"the corpus pass should be O(1) jobs, got $j32")
  }

  // ---- decode round trip (q103 round-10 gate) ----

  test("decode(encode(x)) == normalized x, planted + sf0.001 + sf0.1") {
    Seq(planted.toDF("doc_id", "text"),
        Tables.documents(spark, sf),
        Tables.documents(spark, "/root/testdata/sf0.1")).foreach { docs =>
      val (_, segs) = Bpe.learnCollected(docs, merges = 32)
      val ids = Bpe.subwordIds(Bpe.subwordVocab(segs))
      val enc = Bpe.encode(docs, segs.select("word", "syms"), ids)
      val got = Bpe.decode(enc, ids)
        .as[(Long, String)].collect().toMap
      val want = docs.select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("n"))
        .as[(Long, String)].collect().toMap
      assert(got === want)
      spark.catalog.clearCache()
    }
  }

  // ---- subword shard packing (q105 cross-entry consistency) ----

  test("q105 manifest subword totals equal q103's encoded subword totals") {
    val (_, segs) = Bpe.learnStaged(spark, sf, merges = 32)
    val manifestTotal = Bpe.subwordShardManifest(
        Tables.documents(spark, sf), segs, budget = 2048L)
      .agg(sum("n_subwords")).as[Long].collect().head
    val encodeTotal = Bpe.encode(Tables.documents(spark, sf),
        segs.select("word", "syms"), Bpe.subwordIds(Bpe.subwordVocab(segs)))
      .agg(sum("n_subwords")).as[Long].collect().head
    assert(manifestTotal === encodeTotal)
    spark.catalog.clearCache()
  }

  test("q103 plans broadcast joins only — the corpus side never shuffles by word or subword") {
    val plan = SparkEntry.queries("q103_bpe_encode")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join in q103's plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    // and the tokenizer comes from the staged parquet, not an in-flight learn
    assert(plan.contains("graft_bpe_"))
    spark.catalog.clearCache()
  }

  // ---- staged artifact ----

  test("learnStaged equals the in-flight learn and a re-call touches no file") {
    val (mergesDf, segsDf) = Bpe.learnStaged(spark, sf, merges = 32)
    val (rules, words) = Bpe.learn(Tables.documents(spark, sf), merges = 32)
    val staged = mergesDf.select("rank", "left", "right", "merged", "pair_count")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(staged === rules.map(r =>
      (r.rank, r.left, r.right, r.merged, r.pair_count)).toArray)
    val segs = segsDf.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    val inMem = words.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(segs === inMem)
    words.unpersist()
    // reuse: no file rewritten, and the build closure must not run
    val root = Bpe.bpeRoot(spark, sf, 32)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def states() = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      while (it.hasNext) {
        val st = it.next()
        buf += ((st.getPath.toString, st.getLen, st.getModificationTime))
      }
      buf.sortBy(_._1).toSeq
    }
    val before = states()
    assert(before.nonEmpty)
    assert(Bpe.learnStaged(spark, sf, merges = 32)._1.count() > 0)
    assert(states() === before)
  }

  test("fertilityByGroup: exact counters incl. the character-symbol OOV fallback") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "en", "ab ab abc"),   // 2 known words + 1 known word
      (2L, "en", "zzzz"),        // OOV: falls back to len+1 = 5 symbols
      (3L, "de", "ab"))
      .toDF("doc_id", "lang", "text")
    val segs = Seq(
      ("ab", Seq("ab</w>")),           // 1 subword
      ("abc", Seq("ab", "c</w>")))     // 2 subwords
      .toDF("word", "syms")
    val got = Bpe.fertilityByGroup(docs, segs, col("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en: docs {1,2}; words: ab,ab,abc,zzzz -> 1+1+2+5 = 9 subwords,
    // chars 2+2+3+4 = 11
    assert(got("en") === ((2L, 4L, 9L, 11L)))
    assert(got("de") === ((1L, 1L, 1L, 2L)))
  }

  // ---- byte-level mode (q122/q123 round-11 gates) ----

  /** Multi-script strings exercising every byte-mapping regime:
    * 1-byte ASCII, 2-byte Latin/Greek, 3-byte CJK, 4-byte emoji, soft
    * hyphen (0xAD, a NON-printable Latin-1 byte), and a mixed token.
    * Already lowercase — the tokenizer normalizes case, so a round
    * trip compares against the normalized form. */
  private val hostileDocs = Seq(
    (1L, "hello héllo über"),
    (5L, "a</w>b literal</w> </w>marker"),
    (2L, "日本語 текст ωμέγα"),
    (3L, "🚀🚀 a­b mix🎉ed"),
    (4L, ""))

  test("byteSyms expression equals the driver twin on hostile multi-script words") {
    val words = hostileDocs.flatMap(_._2.split(" ")).filter(_.nonEmpty) :+ "x"
    val got = words.toDF("w")
      .select(col("w"), Bpe.byteSyms(col("w")).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w).toVector === Bpe.byteSymsLocal(w), s"word $w")
    }
    // independent-table cross-check: engine table == test-side table
    assert(Bpe.ByteChar.toVector === BpeReference.refByteChar)
  }

  test("byte mode: planted + sf0.001 merges and ids equal the byte-level reference") {
    Seq(planted -> planted.toDF("doc_id", "text"),
        Tables.documents(spark, sf).select("doc_id", "text")
          .as[(Long, String)].collect().toSeq -> Tables.documents(spark, sf))
      .foreach { case (local, docs) =>
        val wf = refWordFreq(local)
        val (refRules, refSegs) =
          refLearn(wf, 32, initial = BpeReference.byteInitial)
        val (rules, segs) =
          Bpe.learnCollected(docs, merges = 32, symsOf = Bpe.byteSymsLocal)
        assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count)) === refRules)
        val enc = Bpe.encodeBytes(docs, segs.select("word", "syms"),
            Bpe.subwordIds(Bpe.byteVocab(segs)))
          .select("doc_id", "n_words", "n_subwords", "ids")
          .as[(Long, Long, Long, String)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        assert(enc === refEncode(local, refSegs, wf,
          initial = BpeReference.byteInitial,
          baseSymbols = BpeReference.refByteChar :+ Bpe.ByteEndOfWord))
      }
  }

  test("byte mode: zero OOV and a universal decode round trip on unseen hostile input") {
    // tokenizer trained on the sf0.001 corpus — which contains NONE of
    // the hostile scripts — then asked to encode them: every id must be
    // non-zero (the base alphabet guarantees coverage) and decode must
    // return the exact normalized input
    val (_, segs) = Bpe.learnStagedBytes(spark, sf, merges = 32)
    val ids = Bpe.subwordIds(Bpe.byteVocab(segs))
    val hostile = hostileDocs.toDF("doc_id", "text")
    val enc = Bpe.encodeBytes(hostile, segs.select("word", "syms"), ids)
    val zeroIds = enc.select(explode(split(col("ids"), " ")).as("t"))
      .filter(col("t") === "0").count()
    assert(zeroIds === 0L, "byte mode emitted an OOV id")
    val got = Bpe.decodeBytes(enc, ids).as[(Long, String)].collect().toMap
    val want = hostile.select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got === want)
  }

  test("byte mode: decode(encodeBytes(x)) == normalized x on the training corpus") {
    val docs = Tables.documents(spark, sf)
    val (_, segs) = Bpe.learnStagedBytes(spark, sf, merges = 32)
    val ids = Bpe.subwordIds(Bpe.byteVocab(segs))
    val got = Bpe.decodeBytes(
        Bpe.encodeBytes(docs, segs.select("word", "syms"), ids), ids)
      .as[(Long, String)].collect().toMap
    val want = docs.select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got === want)
  }

  test("q139 boundaries tile every shard gaplessly and sum to the manifest") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val (_, segs) = Bpe.learnStaged(spark, sf, merges = 32)
    val bounds = Bpe.packBoundaries(docs, segs, budget = 2048L)
      .collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok")))
    assert(bounds.nonEmpty)
    bounds.groupBy(_._1).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"shard $shard does not start at 0")
      sorted.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, _, s2, _)) =>
          assert(s2 === s1 + n1, s"gap in shard $shard at $s2")
        case _ => ()
      }
    }
    // totals agree with the q105 manifest shard for shard
    val manifest = Bpe.subwordShardManifest(docs, segs, budget = 2048L)
      .collect()
      .map(r => (r.getAs[Long]("shard_id"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_subwords")))).toMap
    val fromBounds = bounds.groupBy(_._1).view.mapValues(rs =>
      (rs.length.toLong, rs.map(_._4).sum)).toMap
    assert(fromBounds === manifest)
  }
}
