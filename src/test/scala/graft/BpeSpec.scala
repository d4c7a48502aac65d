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
}
