package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Distributed byte-pair-encoding merge LEARNING (Sennrich, Haddow &
  * Birch, ACL 2016 — public literature) — the missing stage of the
  * tokenize→encode→pack chain: q25 counts GPT-2-shaped pretokens and
  * q101 encodes ids under a word-level vocabulary, but neither *induces*
  * the subword vocabulary. This operator learns the top-M merges from
  * the corpus and re-encodes documents as subword-id sequences under
  * the learned vocabulary.
  *
  * The algorithm is inherently iterative (each round's argmax decides
  * the next round's state), so the scale argument is about what each
  * round touches:
  *
  *   - the corpus is read ONCE — [[wordFreqs]] is a token-keyed
  *     map-side-combining aggregate whose output is the distinct-word
  *     table (Heaps'-law bounded: sublinear in corpus size, ~10^7 rows
  *     at web scale vs 10^11 corpus rows);
  *   - each round runs ONE map-side-combining pair-count aggregate over
  *     that word table and takes the argmax as a 1-row
  *     TakeOrderedAndProject (`limit(1)` — one row to the driver per
  *     round, the same bounded driver traffic as the CC convergence
  *     count); the merge application is a map-only fold expression; the
  *     per-round lineage is truncated with a lazy localCheckpoint
  *     materialized by the NEXT round's aggregate (the
  *     connectedComponents pattern — one job per round);
  *   - encoding never applies merges per occurrence: a word's final
  *     segmentation is decided once in the word table, and documents
  *     join word→syms on the word key (size-gated by the planner) — the
  *     corpus-side cost is the q101 explode/reassemble shape.
  *
  * Learned artifacts (merge list + per-word segmentations) are
  * write-once fingerprinted parquet ([[learnStaged]]): a tokenizer is
  * trained once per corpus and shipped, so repeated invocations (bench
  * iterations, downstream encodes) must pay a bounded read, not M
  * training rounds.
  *
  * Design-gated rather than DuckDB-oracled: the merge recursion's
  * data-dependent argmax is not expressible as a recursive CTE; the
  * gate is exact merge-for-merge and id-for-id parity with a plain
  * single-node Scala BPE reference implementation in `BpeSpec` (the
  * q80 differential pattern), on both a planted corpus with hand-
  * checkable merges and the sf0.001 table. */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence —
    * Sennrich et al.'s `</w>`, which keeps word-final subwords distinct
    * from word-internal ones and makes decoding unambiguous.
    *
    * Representation note: symbols are plain strings (the original
    * Sennrich representation), so a pathological corpus whose merges
    * assemble the literal string "</w>" out of characters would
    * conflate that subword with the marker in the id space — the same
    * ambiguity the reference representation has, immaterial for
    * encoding (both occurrences ARE the same string) and only visible
    * to a decoder, which this engine does not ship. */
  val EndOfWord = "</w>"

  /** (word, freq) over the corpus — the one corpus-wide pass. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its characters plus
    * [[EndOfWord]]. Pure expression (no UDF): one `substr` per
    * character position. */
  def charSyms(word: Column): Column =
    concat(
      when(length(word) > 0,
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
        .otherwise(array().cast("array<string>")),
      array(lit(EndOfWord)))

  /** Adjacent symbol pairs of a sequence as (a, b) structs — empty for
    * single-symbol sequences (the `when` guard keeps `sequence` from
    * generating a DESCENDING range when size-1 < 1). */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** One BPE merge applied greedily left-to-right as a pure fold
    * expression: scan the sequence once, replacing the LAST accumulated
    * symbol with `a+b` whenever it equals `a` and the incoming symbol
    * equals `b`. A symbol merged this round can never re-match as `a`
    * (its string is strictly longer than `a`), so the fold is exactly
    * the textbook left-to-right non-overlapping pass — "a a a" under
    * (a,a) becomes ["aa","a"], never ["a","aa"]. Map-only, no UDF. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) => {
      val last = when(size(acc) > 0, element_at(acc, size(acc)))
      when(last === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s)))
    })

  /** One learned merge: `rank` (1-based), the pair, its fused form, and
    * the pair count at merge time. */
  final case class MergeRule(rank: Int, left: String, right: String,
    merged: String, pair_count: Long)

  /** Learn up to `merges` BPE merges over `docs`; returns the merge
    * list and the final word table (word, freq, syms). Stops early when
    * no adjacent pair reaches `minCount` (Sennrich et al.'s stopping
    * rule). Deterministic: argmax ties break (left ASC, right ASC), so
    * the merge sequence — and everything downstream — is engine- and
    * partitioning-stable. */
  def learn(docs: DataFrame, merges: Int, minCount: Long = 2L)
      : (Seq[MergeRule], DataFrame) = {
    var words = wordFreqs(docs)
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
      .localCheckpoint(false)
    val rules = Seq.newBuilder[MergeRule]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val top = words
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b, cnt) = (top(0).getAs[String]("a"),
          top(0).getAs[String]("b"), top(0).getAs[Long]("cnt"))
        rules += MergeRule(rank, a, b, a + b, cnt)
        // lazy checkpoint, materialized by the next round's aggregate
        // (or the caller's first action). Prior rounds' checkpoint
        // blocks are reclaimed by the ContextCleaner once their RDDs
        // are unreferenced — the connectedComponents lifecycle; an
        // explicit Dataset.unpersist() would be a no-op here (a
        // localCheckpoint is RDD-level storage, not a CacheManager
        // entry), and dropping the blocks eagerly before the next
        // round materializes would break the truncated lineage.
        words = words.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(false)
        rank += 1
      }
    }
    (rules.result(), words)
  }

  /** Root of the fingerprinted learned-tokenizer materialization for
    * (`dir`, `merges`): merge list + word segmentations, keyed on the
    * source content like every staged artifact (AnnIndex rule). */
  private[graft] def bpeRoot(spark: SparkSession, dir: String, merges: Int): String =
    "target/bpe/graft_bpe_" + Bucketed.md5hex(
      s"$dir/m$merges/${Layout.contentKey(spark, s"$dir/documents.parquet")}")
      .take(8)

  /** Write-once learned tokenizer for `dir`: (merge table, word
    * segmentations), trained only when no finished stage exists for
    * this (source content, merges) key — the root `_SUCCESS` marker is
    * written AFTER both component writes, so a half-built artifact is
    * retrained, never served. */
  def learnStaged(spark: SparkSession, dir: String, merges: Int)
      : (DataFrame, DataFrame) = synchronized {
    val out = bpeRoot(spark, dir, merges)
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ok = new org.apache.hadoop.fs.Path(out, "_SUCCESS")
    if (!fs.exists(ok)) {
      val (rules, words) = learn(Tables.documents(spark, dir), merges)
      spark.createDataFrame(rules).write.mode("overwrite").parquet(s"$out/merges")
      words.write.mode("overwrite").parquet(s"$out/segments")
      fs.create(ok).close()
    }
    (spark.read.parquet(s"$out/merges"), spark.read.parquet(s"$out/segments"))
  }

  /** Subword occurrence counts under a learned word table: every final
    * symbol weighted by its words' corpus frequencies. Bounded by
    * |chars| + |merges| rows. */
  def subwordVocab(wordSegs: DataFrame): DataFrame =
    wordSegs.select(col("freq"), explode(col("syms")).as("subword"))
      .groupBy("subword").agg(sum("freq").as("n"))

  /** Dense ids 1..V for the learned subwords in (n DESC, subword ASC)
    * order — id 0 is the OOV floor for subwords outside the learned
    * vocabulary (only reachable via the unseen-word fallback). The
    * unpartitioned window is bounded by V (the q101 vocabIds
    * argument). */
  def subwordIds(vocab: DataFrame): DataFrame =
    vocab.select(col("subword"), row_number().over(
      Window.orderBy(col("n").desc, col("subword").asc)).as("tid"))

  /** Encode `corpus` as subword-id sequences under a learned tokenizer:
    * (doc_id, n_words, n_subwords, ids) with `ids` the space-joined id
    * string (the q101 canonical emit form). Words absent from the word
    * table fall back to their un-merged character symbols — the honest
    * OOV convention for encoding a corpus the tokenizer was not trained
    * on; their out-of-vocab characters map to id 0. The word join is
    * size-gated (word table is Heaps'-bounded, usually broadcastable);
    * the id map is V rows and broadcast outright; per-doc state is
    * bounded by the document's own subword count. */
  def encode(corpus: DataFrame, wordSegs: DataFrame, ids: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("wpos", "word")))
      .join(wordSegs.select(col("word"), col("syms")), Seq("word"), "left")
      .select(col("doc_id"), col("wpos"),
        posexplode(coalesce(col("syms"), charSyms(col("word"))))
          .as(Seq("spos", "subword")))
      .join(broadcast(ids), Seq("subword"), "left")
      .groupBy("doc_id")
      .agg(count(when(col("spos") === 0, 1)).as("n_words"),
        count(lit(1)).as("n_subwords"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("wpos"), col("spos"),
            coalesce(col("tid"), lit(0)).as("tid")))),
          t => t("tid").cast("string"))).as("ids"))

  val queries: Seq[Query] = Seq(

    Query(
      "q102_bpe_learn",
      "Distributed BPE merge learning (Sennrich et al. 2016): top-32 " +
        "subword merges over the documents corpus — ONE corpus pass " +
        "builds the Heaps'-bounded word-frequency table, then each " +
        "round is one map-side-combining pair-count aggregate over that " +
        "table, a 1-row argmax (ties (left, right) ASC — fully " +
        "deterministic), and a map-only fold-expression merge; lineage " +
        "truncated per round. The learned tokenizer (merges + word " +
        "segmentations) is a write-once fingerprinted parquet artifact " +
        "— trained once per corpus content, read thereafter. No oracle: " +
        "the iterative argmax is not a recursive CTE; gated instead by " +
        "exact merge-for-merge parity with a plain-Scala reference BPE " +
        "in BpeSpec (planted corpus + sf0.001), the q80 differential " +
        "pattern.",
      (s, dir) => learnStaged(s, dir, merges = 32)._1
        .orderBy("rank")),

    Query(
      "q103_bpe_encode",
      "Subword-id encoding under the q102-learned tokenizer: documents " +
        "become space-joined id strings over the induced subword " +
        "vocabulary (ids dense 1..V by (count DESC, subword ASC); 0 = " +
        "OOV fallback, unreachable when encoding the training corpus). " +
        "Per-word segmentations are decided ONCE in the word table and " +
        "joined in (size-gated join; the corpus never re-applies merge " +
        "rounds per occurrence) — the q101 explode/reassemble shape at " +
        "subword granularity. No oracle (vocabulary depends on the " +
        "iterative learn); gated by full-chain id-for-id parity with " +
        "the plain-Scala reference in BpeSpec.",
      (s, dir) => {
        val (_, segs) = learnStaged(s, dir, merges = 32)
        encode(Tables.documents(s, dir), segs,
          subwordIds(subwordVocab(segs)))
          .orderBy("doc_id")
      })
  )
}
