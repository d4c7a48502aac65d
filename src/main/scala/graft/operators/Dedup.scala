package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Deduplication operators for the training-data pipeline: exact
  * (content-hash) and near-duplicate (MinHash + banded LSH with exact
  * n-gram-Jaccard verification) over the `documents` table.
  *
  * Scale design (the part that must survive 100 TB):
  *   - exact dedup is one hash-keyed aggregate — the groupBy key is the
  *     64-hex SHA-256 digest, never the document body, so the shuffle
  *     carries ~72 bytes/doc regardless of document size;
  *   - near-dup NEVER does an all-pairs `crossJoin`: candidate
  *     generation is an equi-join keyed on (band, band-hash) — only
  *     documents agreeing on a full MinHash band meet, which is the
  *     banded-LSH scheme of Broder (1997) / MMDS ch.3. With b bands of
  *     r rows the candidate probability is 1-(1-s^r)^b: at b=64, r=3 a
  *     pair at Jaccard 0.7 is missed with p≈1e-12 while pairs below 0.3
  *     almost never collide, so candidate volume stays linear-ish;
  *   - signatures are one map-side pass: k partial `min` aggregates
  *     (map-side combine) per doc — no per-row state, no driver state;
  *   - exact verification touches candidates only: shingle sets are
  *     re-joined just for docs that share a band.
  */
object Dedup {

  import TextAnalysis.{norm, shingles}

  /** MinHash signature per document, computed entirely per ROW: the
    * token array's n-gram hashes ([[TextAnalysis.shingleHashArray]], one
    * xxhash64 per shingle) feed the native
    * [[graft.functions.MinHashSignature]] expression, whose fused loop
    * takes the k affine-family mins in a local k-long array. No shingle
    * explode, no k-way min aggregate, NO SHUFFLE — signatures are map
    * work at any scale (duplicate shingles are harmless: min is
    * idempotent). Documents with fewer than n tokens have no shingles
    * and are dropped, exactly as the exploded formulation dropped them. */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int): DataFrame =
    // filter on the TOKEN COUNT, not on size() of the aliased hash array:
    // a filter over the aliased column gets pushed below the projection
    // with the whole (interpreted, CodegenFallback) higher-order shingle
    // expression re-inlined into its condition — measured 8x slower than
    // this cheap equivalent predicate (<n tokens <=> zero shingles)
    docs.filter(size(TextAnalysis.tokensFast(col("text"))) >= n)
      .select(col("doc_id"),
        graft.functions.MinHashSignature.minhash_signature(
          TextAnalysis.shingleHashArray(TextAnalysis.tokensFast(col("text")), n), k).as("sig"))

  /** Banded LSH: hash each of the b consecutive r-slot bands of the
    * signature to one 64-bit bucket key; emit (doc_id, band, band_hash). */
  def bands(sigs: DataFrame, b: Int, r: Int): DataFrame = {
    val bandHash = (j: Int) =>
      xxhash64((lit(j) +: (0 until r).map(i => col("sig")(j * r + i))): _*)
    sigs.select(col("doc_id"),
      posexplode(array((0 until b).map(bandHash): _*)).as(Seq("band", "band_hash")))
  }

  /** All ordered member pairs co-occurring in a bucket — the bucket→pairs
    * step of every banded-LSH scheme, WITHOUT a self-join: one aggregation
    * collects each bucket's member structs (sorted, so `a < b` by the
    * leading id field), and the pair expansion happens inside the row via
    * higher-order functions. A self-join formulation reads the bucket
    * frame twice, and because AQE launches both join-side map stages
    * concurrently, even a persisted frame gets computed twice (the cache
    * population races) — this shape reads it exactly once.
    *
    * Rows out: one (a, b) struct pair per co-bucketed pair; callers
    * project fields and `distinct()` across buckets. Skew contract: a
    * bucket of m members expands to m(m-1)/2 pairs inside one task — the
    * standard LSH caveat; keep buckets selective (enough bits/rows per
    * band). */
  private[graft] def pairsWithinBuckets(df: DataFrame, bucketCols: Seq[String],
      fields: Seq[String]): DataFrame = {
    val ms = array_sort(collect_list(struct(fields.map(col): _*)))
    df.groupBy(bucketCols.map(col): _*)
      .agg(ms.as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(flatten(transform(col("ms"), (a, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  /** Candidate pairs (doc_a < doc_b) sharing at least one LSH band —
    * bucket-grouped pair expansion keyed on (band, band_hash), never an
    * all-pairs product and never a second scan of the band frame. */
  def candidatePairs(bandsDf: DataFrame): DataFrame =
    pairsWithinBuckets(bandsDf, Seq("band", "band_hash"), Seq("doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Exact Jaccard for candidate pairs from per-doc shingle ARRAYS:
    * two equi-joins pin each pair's shingle sets side by side, and
    * |A∩B| is an in-row `array_intersect` — 2 exchanges total, vs ~6
    * for the shingle-row join formulation ([[verifyJaccard]], kept as
    * the brute-force test oracle). `shArr` carries one row per
    * candidate DOC (not per shingle), so both joins broadcast at any
    * candidate volume that fits the LSH contract; per-row cost is
    * O(|A|+|B|) on sorted-set intersection of bounded document
    * shingle sets. */
  def verifyJaccardArrays(cand: DataFrame, shArr: DataFrame): DataFrame =
    cand
      .join(shArr.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(shArr.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).as("i"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
          .as("jaccard"))

  /** Exact Jaccard over the shingle sets, computed only for candidate
    * pairs: |A∩B| via a shingle equi-join restricted to candidates,
    * |A∪B| = |A|+|B|-|A∩B|. */
  def verifyJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sh.as("sb"),
        col("sb.doc_id") === col("doc_b") && col("sb.shingle") === col("sa.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("za.doc_id") === col("doc_a"))
      .join(sizes.as("zb"), col("zb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("za.n") + col("zb.n") - col("inter")).cast("double")).as("jaccard"))
  }

  /** Full near-dup pipeline: shingle-hash → MinHash(k) → LSH(b×r) →
    * candidate bucket expansion → exact-Jaccard verify → threshold.
    *
    * Plan shape (round-3 restructure — was 4 full corpus re-scans plus a
    * needless distinct on the signature path):
    *   1. signatures are PER-ROW map work (native fused expression, see
    *     [[minhashSignatures]]) — the old shingle explode + k-way min
    *     aggregate and its doc-keyed exchange are gone entirely;
    *   2. candidate pairs are persisted (a handful of rows) and their
    *     doc ids broadcast back as a semi-filter, so the exact-verify
    *     branches distinct/join only the CANDIDATE documents' shingles —
    *     the verify shuffles shrink from all-corpus to candidates-only;
    *   3. total corpus scans: 2 (signatures; candidate-shingle filter),
    *     each map-only until a tiny aggregate/exchange. The persisted
    *     frames are KB-sized, so executor memory is untouched at any
    *     scale — this IS the 100 TB shape, not a local[32] shortcut. */
  def nearDuplicates(docs: DataFrame, n: Int, k: Int, b: Int, r: Int,
      threshold: Double): DataFrame = {
    require(k >= b * r, s"signature of $k slots cannot fill $b bands of $r")
    // The persisted candidate frame is materialized EAGERLY (count()): it
    // is KB-sized but guards the expensive pipelines (signature corpus
    // scan; candidate-shingle corpus scan), and lazy persists race —
    // downstream stages launch concurrently under AQE and each computes
    // the uncached frame again. The barrier pins corpus scans at exactly
    // two, at any scale. The rebalance spreads a low-split local scan
    // across cores before the per-row signature loop (no-op at scale).
    val cand = candidatePairs(
      bands(minhashSignatures(Tables.rebalanced(docs), n, k), b, r)).persist()
    cand.count()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    // semi-filter the DOCUMENTS by candidate id and build each one's
    // distinct shingle ARRAY per row — no explode, no distinct shuffle,
    // no aggregate; the candidate docs' second tokenize pass is the only
    // other corpus scan. Persisted + counted so the two verify joins
    // read it from storage instead of re-scanning the corpus each.
    val shArr = docs.join(broadcast(candDocs), Seq("doc_id"))
      .select(col("doc_id"),
        array_distinct(TextAnalysis.shingleArray(
          TextAnalysis.tokensFast(col("text")), n)).as("sh"))
      .persist()
    shArr.count()
    verifyJaccardArrays(cand, shArr)
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  // ---- exact similarity join (prefix filtering) ----

  /** EXACT all-pairs Jaccard similarity join — no LSH, no approximation:
    * the prefix-filtering inverted-index family (SSJoin/All-Pairs/PPJoin;
    * Chaudhuri 2006, Bayardo 2007, Xiao 2008), in the symmetric
    * bucket-join formulation:
    *
    *   1. per doc: the distinct shingle-hash set, ordered by GLOBAL
    *      document frequency (rarest first, ties by hash) — frequency
    *      ordering is what keeps stop-shingles out of every prefix, so
    *      inverted-index buckets stay small at any corpus size;
    *   2. per doc: index only the first `|X| - ceil(u*|X|) + 1` ordered
    *      shingles, u = tau/(1+tau). Losslessness: J(A,B) >= tau implies
    *      |A∩B| >= u*(|A|+|B|); a pair missing from every shared bucket
    *      must hide all common shingles outside one of the two prefixes,
    *      of which there are at most (ceil(u|A|)-1) + (ceil(u|B|)-1) <
    *      u*(|A|+|B|) — contradiction;
    *   3. candidates: bucket-grouped pair expansion on the prefix hash
    *      (one aggregation, no self-join), pruned by the length filter
    *      min(|A|,|B|) >= tau*max(|A|,|B|) (necessary for J >= tau);
    *   4. exact verify: in-row intersection of the full sorted hash sets.
    *
    * Scale shape: one corpus scan for the per-doc sets (persisted — at
    * 100 TB this is the dedup working set an engine would checkpoint),
    * one shingle-keyed shuffle for document frequencies, one for the
    * frequency-ordered re-collection, one prefix-keyed shuffle for
    * candidates; verification is two doc-keyed equi-joins. Never a
    * cartesian product, and no recall/precision trade at all —
    * cross-validated against q17's LSH pipeline by the same oracle.
    *
    * Jaccard is computed over 64-bit shingle hashes (a collision merging
    * two shingles within a doc has p≈2^-64; the brute-force ScalaTest
    * and the DuckDB oracle would both catch it).
    *
    * Cache contract: `base` (one shingle-hash array per doc) stays
    * persisted for the session — it is the operator's working set and
    * the result frame reads it lazily, so the operator cannot unpersist
    * it itself. Batch drivers that run many queries in one session
    * should `spark.catalog.clearCache()` between them (Bench and Verify
    * both do). */
  def jaccardJoin(docs0: DataFrame, n: Int, tau: Double): DataFrame = {
    val docs = Tables.rebalanced(docs0)
    val base = docs
      .filter(size(TextAnalysis.tokensFast(col("text"))) >= n)
      .select(col("doc_id"), array_sort(array_distinct(
        TextAnalysis.shingleHashArray(TextAnalysis.tokensFast(col("text")), n))).as("hs"))
      .persist()
    base.count() // barrier: 4 consumers below, corpus scanned exactly once
    jaccardJoinOnHashes(base, tau)
  }

  /** Frequency-ordered prefix tokens of a `(carry..., doc_id, hs, sz)`
    * frame: (carry..., doc_id, sz, h) with one row per prefix hash. The
    * ONE home of the losslessness-critical prefix arithmetic, shared by
    * the self-join (q28) and cross-corpus (q70) forms:
    *
    *   - document frequencies over the WHOLE input frame order the
    *     prefixes (rarest first — fewest candidates), and both q70 sides
    *     flow through one call, so both draw from one global order (the
    *     prefix-filter theorem's precondition);
    *   - epsilon inside the ceil: if u·sz lands a hair ABOVE an integer
    *     in fp, a bare ceil overshoots the true ceiling and shortens the
    *     prefix by one — which would break losslessness; the epsilon can
    *     only ever lengthen the prefix (more candidates, never a miss).
    */
  private[graft] def prefixTokens(withSz: DataFrame, tau: Double,
      carry: Seq[String], pruneSingletons: Boolean = false): DataFrame = {
    val u = tau / (1.0 + tau)
    prefixTokensBy(withSz,
      (col("sz") - ceil(col("sz") * u - 1e-9) + 1).cast("int"), carry,
      pruneSingletons)
  }

  /** [[prefixTokens]] with a caller-supplied prefix-length expression —
    * the shared frequency-ordered-prefix machinery, parameterized so
    * each similarity predicate brings its own counting bound (Jaccard:
    * sz − ⌈sz·τ/(1+τ)⌉ + 1; containment: ⌊sz·(1−τ)⌋ + 1). Any fixed
    * global token order preserves losslessness; rare-first (df ASC)
    * minimizes candidates. */
  private[graft] def prefixTokensBy(withSz: DataFrame, prefixLen: Column,
      carry: Seq[String], pruneSingletons: Boolean = false): DataFrame = {
    val keys = carry ++ Seq("doc_id", "sz")
    val dfreq = withSz.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = withSz
      .select(keys.map(col) :+ explode(col("hs")).as("h"): _*)
      .join(dfreq, Seq("h"))
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
    // df >= 2 prune (round 18, guide §2.3), OPT-IN per call site: a
    // prefix token whose document frequency is 1 occurs exactly once in
    // THIS input frame, so an equi-join on `h` whose other side draws
    // from the SAME frame — self-bucket (q28/q40/q34/q137), tagged
    // union (q70, both sides prefixed from one union-wide df), or
    // inner×outer over one frame (q99) — can never pair it with a
    // DIFFERENT document: singleton buckets expand to zero pairs and
    // cross joins need an occurrence on both sides. Dropping those rows
    // BEFORE the candidate exchange shrinks its bytes by the unique-
    // shingle mass (the dominant fraction of any natural corpus),
    // bit-identically. The prune is UNSOUND when the probe side is a
    // FOREIGN frame the df never counted — the streaming ingest gate
    // (q93) indexes corpus-only prefixes and probes them with incoming
    // batch hashes, where a corpus-df==1 token is a perfectly good
    // candidate — hence the explicit flag, default off.
    val sliced = ordered.select(
      keys.map(col) :+ explode(slice(col("ord"), lit(1), prefixLen)).as("t"): _*)
    (if (pruneSingletons) sliced.filter(col("t.df") >= 2) else sliced)
      .select(keys.map(col) :+ col("t.h").as("h"): _*)
  }

  /** Size prune necessary for J >= tau, relaxed by an epsilon so fp
    * rounding of tau*max can only ever KEEP a pair, never drop one. */
  private[graft] def sizePrune(na: Column, nb: Column, tau: Double): Column =
    least(na, nb).cast("double") >= greatest(na, nb) * tau - 1e-9

  /** The prefix-filter join of [[jaccardJoin]] over a prepared `(doc_id,
    * hs)` frame — `hs` the doc's sorted distinct 64-bit shingle hashes,
    * already persisted by the caller (so a pipeline that owns a shared
    * tokenization pass, q34, skips this operator's own corpus scan). */
  def jaccardJoinOnHashes(base: DataFrame, tau: Double): DataFrame = {
    val withSz = base.select(col("doc_id"), col("hs"), size(col("hs")).as("sz"))
    val pref = prefixTokens(withSz, tau, carry = Nil, pruneSingletons = true)
    val cand = pairsWithinBuckets(pref, Seq("h"), Seq("doc_id", "sz"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("na"), col("b.sz").as("nb"))
      .filter(sizePrune(col("na"), col("nb"), tau))
      .dropDuplicates("doc_a", "doc_b")
      .persist()
    cand.count()
    verifyJaccardArrays(cand.select("doc_a", "doc_b"),
        base.select(col("doc_id"), col("hs").as("sh")))
      .filter(col("jaccard") >= tau)
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental-ingest near-dedup: every (corpus, batch) pair with
    * exact n-gram Jaccard >= tau — the CROSS-corpus form of
    * [[jaccardJoin]], the gate an ingest pipeline runs so a new crawl
    * drop does not re-add near-duplicates of documents the corpus
    * already holds (within-batch duplicates are q28's job; the two
    * compose into the full ingest gate).
    *
    * Same lossless prefix-filter theorem, one twist: the document
    * frequencies that order each prefix are computed over the UNION of
    * the two sides, because the theorem needs both prefixes drawn from
    * ONE global token order — per-side frequencies would order the same
    * token differently on each side and break the shared-prefix
    * guarantee. Candidates are then a plain prefix-hash EQUI-join of the
    * corpus side against the batch side: no self-join, no a<b dance, and
    * the join is naturally asymmetric — at scale the batch side is a
    * day's drop (small), so AQE broadcasts it while the corpus side
    * streams. Sides are kept distinct end-to-end (tagged union, side-
    * aware verify joins), so overlapping doc-id spaces cannot cross-
    * contaminate. Verification intersects full sorted hash sets for
    * candidates only, exactly as q28.
    *
    * Cache contract as [[jaccardJoin]]: the tagged per-doc hash-set
    * frame is the operator's working set and stays persisted; batch
    * drivers clearCache() between queries. */
  def crossJaccardMatches(corpus0: DataFrame, batch0: DataFrame,
      n: Int, tau: Double): DataFrame = {
    def prep(docs: DataFrame, side: String) = Tables.rebalanced(docs)
      .filter(size(TextAnalysis.tokensFast(col("text"))) >= n)
      .select(lit(side).as("side"), col("doc_id"), array_sort(array_distinct(
        TextAnalysis.shingleHashArray(TextAnalysis.tokensFast(col("text")), n))).as("hs"))
    val base = prep(corpus0, "c").unionByName(prep(batch0, "b")).persist()
    base.count() // barrier: df pass, prefix pass, and both verify sides
    val withSz = base.select(col("side"), col("doc_id"), col("hs"),
      size(col("hs")).as("sz"))
    // ONE prefixTokens call over the tagged union — both sides draw
    // their prefixes from the same union-wide frequency order, the
    // precondition the operator scaladoc calls out (which also makes
    // the singleton prune sound: a union-wide df==1 token exists on
    // only one side)
    val pref = prefixTokens(withSz, tau, carry = Seq("side"),
      pruneSingletons = true)
    val cand = pref.filter(col("side") === "c")
      .select(col("h"), col("doc_id").as("corpus_doc"), col("sz").as("na"))
      .join(pref.filter(col("side") === "b")
        .select(col("h"), col("doc_id").as("batch_doc"), col("sz").as("nb")), Seq("h"))
      .filter(sizePrune(col("na"), col("nb"), tau))
      .select("corpus_doc", "batch_doc")
      .dropDuplicates("corpus_doc", "batch_doc")
      .persist()
    cand.count()
    cand
      .join(base.filter(col("side") === "c")
        .select(col("doc_id").as("corpus_doc"), col("hs").as("sa")), Seq("corpus_doc"))
      .join(base.filter(col("side") === "b")
        .select(col("doc_id").as("batch_doc"), col("hs").as("sb")), Seq("batch_doc"))
      .select(col("corpus_doc"), col("batch_doc"),
        size(array_intersect(col("sa"), col("sb"))).as("i"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .select(col("corpus_doc"), col("batch_doc"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy("corpus_doc", "batch_doc")
  }

  /** Asymmetric CONTAINMENT join: every ordered pair (inner, outer)
    * with |S_inner ∩ S_outer| / |S_inner| ≥ τ — doc `inner` is mostly
    * contained in doc `outer`. This is the duplication Jaccard
    * structurally misses: a quote, repost, or boilerplate-wrapped copy
    * inside a much longer document has near-1 containment but tiny
    * Jaccard (the union is dominated by the container), so a τ-Jaccard
    * gate never fires.
    *
    * Lossless one-sided prefix filter, containment bound: if
    * containment(a→b) ≥ τ then b misses at most ⌊(1−τ)·|S_a|⌋ of a's
    * grams, so b must hit at least one gram of ANY
    * (⌊(1−τ)·|S_a|⌋+1)-subset of S_a — in particular a's rare-first
    * prefix. The INNER side emits only that prefix; the OUTER side
    * emits its full gram stream (the q70/q93 one-sided shape — no
    * union-wide prefix pairing needed, which is also what keeps the
    * filter valid for a predicate with no symmetric length bound: a
    * 10-gram doc can be contained in a 10-million-gram one). The only
    * size prune that IS sound — |S_outer| ≥ τ·|S_inner| — is applied
    * on the candidate pairs. Exact verify on candidates only; grams
    * travel as xxhash64 (the q39 argument), and the oracle's
    * string-gram recount doubles as the collision check. */
  def containmentJoin(docs0: DataFrame, n: Int, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must lie in (0, 1]: $tau")
    val base = Tables.rebalanced(docs0)
      .filter(size(TextAnalysis.tokensFast(col("text"))) >= n)
      .select(col("doc_id"), array_sort(array_distinct(
        TextAnalysis.shingleHashArray(TextAnalysis.tokensFast(col("text")), n))).as("hs"))
      .persist()
    base.count() // barrier: df pass, prefix pass, and both verify sides
    val withSz = base.select(col("doc_id"), col("hs"), size(col("hs")).as("sz"))
    // +1e-9 relaxation can only WIDEN the prefix (keep more), never drop.
    // Singleton prune is sound here: the outer stream below is the SAME
    // frame the df counted, so a df==1 inner prefix token matches only
    // its own doc — killed by the inner =!= outer filter.
    val innerPref = prefixTokensBy(withSz,
        (floor(col("sz") * (1.0 - tau) + 1e-9) + 1).cast("int"), carry = Nil,
        pruneSingletons = true)
      .select(col("doc_id").as("inner_doc"), col("sz").as("ni"), col("h"))
    val outerAll = withSz
      .select(col("doc_id").as("outer_doc"), col("sz").as("no"), explode(col("hs")).as("h"))
    val cand = innerPref.join(outerAll, Seq("h"))
      .filter(col("inner_doc") =!= col("outer_doc") &&
        col("no").cast("double") >= col("ni") * tau - 1e-9)
      .select("inner_doc", "outer_doc")
      .dropDuplicates("inner_doc", "outer_doc")
      .persist()
    cand.count()
    // Materialize the (pairs-sized) verify result, then RELEASE the two
    // corpus-scale upstream caches before returning: a long-lived SQL
    // session invoking the graft_containment TVF repeatedly would
    // otherwise accumulate a base+cand cache pair per call (round-8
    // advice). The returned frame stays cached — bounded by the match
    // set, not the corpus; callers may unpersist it when done.
    val out = cand
      .join(base.select(col("doc_id").as("inner_doc"), col("hs").as("si")), Seq("inner_doc"))
      .join(base.select(col("doc_id").as("outer_doc"), col("hs").as("so")), Seq("outer_doc"))
      .select(col("inner_doc"), col("outer_doc"),
        (size(array_intersect(col("si"), col("so"))).cast("double") /
          size(col("si")).cast("double")).as("containment"))
      .filter(col("containment") >= tau)
      .orderBy("inner_doc", "outer_doc")
      .persist()
    out.count()
    cand.unpersist()
    base.unpersist()
    out
  }

  /** Session memo of [[containmentJoin]] for the `graft_containment`
    * TVF, keyed on (view plan, n, tau): the join's result frame stays
    * persisted by contract (bounded by the match set), so a long-lived
    * SQL session sweeping parameters would otherwise accumulate one
    * cached frame per parameter set for its lifetime (round-9 advice).
    * LRU-capped at 8; evicted entries are unpersisted on the way out.
    * Single-flight per key ([[KeyedMemo]], round-10 advice): the join
    * runs outside the map lock, so concurrent sessions resolving
    * DIFFERENT views never serialize behind one join, while two
    * resolutions of the SAME view still compute once. Staleness is
    * table-cache-like (documented at the TVF registration): a view
    * whose underlying files change under the same path in-session is
    * served the memoized result. A memo hit whose cache was dropped by
    * an intervening `clearCache()` recomputes through lineage — slower,
    * never wrong. */
  private val containmentMemo =
    new KeyedMemo[DataFrame](8, _.unpersist())

  def containmentJoinMemo(docs: DataFrame, n: Int, tau: Double): DataFrame = {
    val plan = docs.queryExecution.analyzed.canonicalized
    val key = s"$n/$tau/${plan.semanticHash()}:$plan"
    containmentMemo.getOrCompute(key)(containmentJoin(docs, n, tau))
  }

  // ---- substring-level exact dedup (Lee et al. 2022 family) ----

  /** Maximal token spans duplicated ACROSS documents — substring-level
    * exact dedup, the third member of the dedup family next to
    * document-level exact (q16) and near-dup (q17/q28). This is the
    * operation "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al., ACL 2022 — public literature) runs with a
    * suffix array over the whole corpus; a suffix array is inherently
    * single-address-space, so the engine uses the Spark-shaped
    * equivalent: one rolling 64-bit hash per n-token window (the same
    * fused per-row [[TextAnalysis.shingleHashArray]] expression the
    * near-dup pipelines use — map-only, no shuffle), a window-hash
    * aggregate to find hashes seen in more than one document, and a
    * per-doc gaps-and-islands merge of the surviving windows into
    * maximal spans (the q13 sessionize shape).
    *
    * Scale shape: the exploded window frame is one 16-byte (pos, hash)
    * row per token — linear in corpus size; the duplicate-hash aggregate
    * exchanges 8-byte keys with min/max partials combined map-side
    * (min≠max replaces a COUNT(DISTINCT doc) — no Expand, no distinct
    * shuffle); only DUPLICATED windows reach the island merge, whose
    * one doc-keyed shuffle carries spans, not text. Never corpus×corpus.
    * The window frame is derived twice (once under the duplicate-hash
    * aggregate, once as the join probe side) — deliberately recomputed
    * map work rather than a persisted corpus×tokens frame, the same
    * two-scan stance as [[nearDuplicates]]: at 100 TB you re-stream a
    * map-only pass, you don't cache it.
    *
    * Like q28, "same hash" stands in for "same n-gram" (a cross-doc
    * collision has p≈2^-64 per pair and the DuckDB string-keyed oracle
    * would catch it). Output: (doc_id, start_pos, end_pos, n_windows) —
    * 1-based inclusive token positions of each maximal duplicated span. */
  def spanDedup(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokensFast(col("text"))
    val w = Tables.rebalanced(docs)
      .filter(size(toks) >= n)
      .select(col("doc_id"),
        posexplode(TextAnalysis.shingleHashArray(toks, n)).as(Seq("pos", "h")))
    val dup = w.groupBy("h")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select("h")
    val marked = w.join(dup, Seq("h"))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos")) // 1-based
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    marked
      // windows [pos, pos+n-1] overlap (or touch) the running span iff
      // pos <= previous pos + n - 1; positions are strictly increasing
      // within a doc, so the previous window's end IS the running max end
      .withColumn("new_span",
        when(col("pos") > lag(col("pos"), 1, Long.MinValue / 2).over(byDoc) + (n - 1), 1L)
          .otherwise(0L))
      .withColumn("span", sum("new_span").over(byDoc))
      .groupBy("doc_id", "span")
      .agg(min("pos").as("start_pos"), (max("pos") + (n - 1)).cast("long").as("end_pos"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "start_pos", "end_pos", "n_windows")
      .orderBy("doc_id", "start_pos")
  }

  // ---- SimHash (Charikar 2002) ----

  /** 64-bit SimHash over the 3-gram shingle set: bit j of the fingerprint
    * is the sign of Σ_shingles (±1 depending on bit j of the shingle
    * hash), computed per ROW by the native fused
    * [[graft.functions.SimHash64]] expression — map-only at any scale.
    * Note the statistical contract: with only ~10² features per
    * short document, a 3% feature diff still lands E[Hamming] ≈ 10 — on
    * short documents SimHash separates *identical-modulo-formatting* from
    * *different*, while MinHash (q17) is the graded-similarity detector;
    * on long documents (10⁴+ features) SimHash tightens into the
    * near-dup radius. Both are offered because at 100 TB SimHash is one
    * 8-byte fingerprint per doc vs MinHash's k×8-byte signature. */
  def simhash64(docs: DataFrame): DataFrame =
    // per-row fused loop over the DISTINCT shingle-hash set (distinct by
    // 64-bit hash ≈ distinct by shingle; a collision merging two
    // shingles has p≈2^-64 per doc and only perturbs one fingerprint) —
    // no explode, no 64-sum aggregate, no shuffle; featureless docs are
    // dropped exactly as the exploded formulation dropped them
    Tables.rebalanced(docs)
      .filter(size(TextAnalysis.tokensFast(col("text"))) >= 3)
      .select(col("doc_id"),
        graft.functions.SimHash64.simhash64(array_distinct(
          TextAnalysis.shingleHashArray(TextAnalysis.tokensFast(col("text")), 3)))
          .as("simhash"))

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist (≤ 3 here):
    * band the 64-bit fingerprint into 4×16-bit chunks — by pigeonhole any
    * pair within Hamming 3 agrees on at least one whole chunk, so an
    * equi-join on (chunk index, chunk value) finds ALL such pairs without
    * an all-pairs product; `bit_count(xor)` verifies the exact distance.
    *
    * Chunk-width tuning at scale: RANDOM chunk collisions contribute
    * ~N²/2^16 expected candidate pairs per chunk (measured harmless at
    * the 10× stress tier, STRESS_SF1.json), so a corpus orders of
    * magnitude larger keeps candidates linear by widening the signature
    * (128-bit SimHash → 4×32-bit chunks at the same radius) or by
    * requiring agreement on a chunk PAIR (the multi-index trick from the
    * Manku et al. 2007 web-dedup paper) — both change only the banding
    * arithmetic below, not the pipeline shape. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame =
    hamming64NearDups(
      simhash64(docs).select(col("doc_id"), col("simhash").as("fp")), maxDist)

  /** Near-dup pairs over ANY 64-bit per-doc fingerprint by Hamming
    * distance ≤ maxDist (≤ 3): the q22 banding machinery factored out —
    * SimHash text fingerprints and the multimodal dHash image
    * fingerprints (q110) are the same problem once the fingerprint
    * exists. Bands the word into 4×16-bit chunks; by pigeonhole any
    * pair within Hamming 3 agrees on at least one whole chunk, so an
    * equi-join on (chunk index, chunk value) finds ALL such pairs with
    * no all-pairs product; `bit_count(xor)` verifies the exact
    * distance. Input: (doc_id, fp) — one row per doc. */
  def hamming64NearDups(fps: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk banding only guarantees recall up to Hamming 3")
    val chunked = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("fp"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "cv")))
    // bucket-grouped pair expansion: the fingerprints ride along in the
    // member structs, so no re-join against the fingerprint frame (and no
    // second corpus scan) is ever needed
    val cand = pairsWithinBuckets(chunked, Seq("chunk", "cv"), Seq("doc_id", "fp"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("ha"), col("b.fp").as("hb"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  /** The q16 exact-dedup keep list as a reusable frame: lowest doc_id
    * per normalized SHA-256 content hash, with copy counts. Shared by
    * the catalog entry and the `graft_dedup_keep` SQL table function
    * ([[graft.GraftExtensions]]) so both surfaces carry the identical
    * digest-keyed contract. */
  def exactKeepList(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), sha2(norm(col("text")), 256).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "content_hash", "n_copies")

  /** C4-style segment-level exact dedup WITH document reassembly: split
    * every document into `w`-token segments, keep only the FIRST
    * corpus-wide occurrence of each distinct segment (first = smallest
    * (doc_id, pos)), and rebuild each document from its surviving
    * segments — the cleaning stage that strips boilerplate lines /
    * repeated paragraphs while keeping the rest of the document, where
    * q16 drops whole duplicate documents and q64 only REPORTS duplicate
    * spans.
    *
    * Scale shape: segmentation is map-only (stride-`w` slices of the
    * token array, no self-join); the owner election is ONE segment-keyed
    * map-side-combining `min(struct(doc_id, pos))` aggregate — an
    * aggregate, NOT a per-segment window, so a boilerplate segment
    * repeated a billion times costs its partial aggregates, never a
    * single-task sort; survivors join back segment-keyed (linear), and
    * reassembly is a doc-keyed aggregate whose state is bounded by one
    * document's own segments. Ubiquitous-segment skew dies in the
    * map-side combine.
    *
    * Reassembled text is the space-join of surviving segments in
    * original order (the `w`-token segmentation already normalizes
    * whitespace, so byte-level spacing of the source is not
    * reconstructable — documented, and mirrored exactly by the
    * oracle).
    *
    * State bound caveat (round-8 verdict): the reassembly aggregate's
    * state is one document's own surviving segments — bounded by the
    * longest single document, not the corpus. Web-scale corpora cap
    * document length upstream (a curation gate every real pipeline
    * has); a corpus with multi-GB single documents would need a
    * chunked reassembly (segment-range keys + a second concat level)
    * before this operator — out of scope while the repo's curation
    * stages gate length first. */
  def segmentDedup(docs: DataFrame, w: Int): DataFrame = {
    require(w > 0, s"segment width must be positive: $w")
    val toks = TextAnalysis.tokens(col("text"))
    val nseg = ceil(size(toks).cast("double") / w).cast("long")
    val segs = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0L), nseg - 1),
        i => concat_ws(" ", slice(toks, (i * w + 1).cast("int"), lit(w)))))
        .as(Seq("pos", "seg")))
    val owners = segs.groupBy("seg")
      .agg(min(struct(col("doc_id"), col("pos"))).as("o"))
    val kept = segs.join(owners, Seq("seg"))
      .filter(col("doc_id") === col("o.doc_id") && col("pos") === col("o.pos"))
    val perDoc = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          t => t("seg"))).as("text_kept"))
    docs.select(col("doc_id"), nseg.as("n_segments"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Staged-fingerprint oracle root for q22 (round-13 upgrade — the
    * q110 convention; see the entry doc). */
  @volatile private[graft] var simhashOracleRoot: Option[String] = None

  /** Write-once staged SimHash fingerprints (doc_id, fp). */
  private[graft] def simhashStaged(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val out = "target/dedup/graft_simhash_" + Bucketed.md5hex(
      s"$dir/${Layout.contentKey(spark, s"$dir/documents.parquet")}").take(8)
    Staging.ensure(spark, out) { tmp =>
      simhash64(Tables.documents(spark, dir))
        .select(col("doc_id"), col("simhash").as("fp"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/fp")
    }
    out
  }

  // `def`, not `val`: q22's oracle SQL embeds the staged root set by
  // the entry's run (the q105 convention)
  def queries: Seq[Query] = Seq(

    Query(
      "q16_dedup_exact",
      "Exact deduplication: normalize → SHA-256 content hash → keep the lowest " +
        "doc_id per hash. The aggregate is keyed on the digest (72 bytes/doc " +
        "over the shuffle, not the body); survivors come out with their copy " +
        "count. On this corpus every doc is unique — the operator's value is " +
        "the contract, verified exactly by the oracle.",
      (s, dir) =>
        exactKeepList(Tables.documents(s, dir))
          .orderBy("doc_id"),
      Some("""
        SELECT MIN(doc_id) AS doc_id, content_hash, COUNT(*) AS n_copies
        FROM (SELECT doc_id, sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
              FROM documents)
        GROUP BY content_hash
        ORDER BY doc_id""")),

    Query(
      "q17_dedup_minhash",
      "Near-duplicate detection: word-3-gram shingles → 192-slot MinHash → " +
        "64×3 banded LSH candidates (equi-join on band hash, never crossJoin) → " +
        "exact Jaccard verify ≥ 0.7. The oracle is the brute-force shingle-join " +
        "Jaccard — they agree because banding at b=64,r=3 misses a 0.7-similar " +
        "pair with p≈1e-12.",
      (s, dir) =>
        nearDuplicates(Tables.documents(s, dir), n = 3, k = 192, b = 64, r = 3,
          threshold = 0.7),
      Some("""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
          FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
                FROM documents)
        ), sz AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard
        FROM inter
        JOIN sz za ON za.doc_id = doc_a
        JOIN sz zb ON zb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) >= 0.7
        ORDER BY doc_a, doc_b""")),

    Query(
      "q28_jaccard_join",
      "EXACT n-gram Jaccard similarity join >= 0.7 via frequency-ordered " +
        "prefix filtering (All-Pairs/PPJoin family): inverted-index candidates " +
        "on rare-shingle prefixes + length pruning + in-row set verify. " +
        "Lossless by the prefix-filter theorem — same oracle as q17's " +
        "MinHash-LSH pipeline, so the two algorithm families cross-validate.",
      (s, dir) =>
        jaccardJoin(Tables.documents(s, dir), n = 3, tau = 0.7),
      Some("""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
          FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
                FROM documents)
        ), sz AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard
        FROM inter
        JOIN sz za ON za.doc_id = doc_a
        JOIN sz zb ON zb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) >= 0.7
        ORDER BY doc_a, doc_b""")),

    Query(
      "q64_span_dedup",
      "Substring-level exact dedup (Lee et al. 2022 family): maximal 20-token " +
        "spans duplicated across documents, via per-row rolling window hashes " +
        "(fused expression, no shuffle) -> min!=max duplicate-hash aggregate " +
        "(no COUNT DISTINCT, no Expand) -> per-doc gaps-and-islands span merge. " +
        "The suffix-array method's Spark-shaped equivalent; linear shuffle " +
        "volume at any corpus size. Oracle: DuckDB over the gram STRINGS, so a " +
        "hash collision on the Spark side would surface as a mismatch.",
      (s, dir) => spanDedup(Tables.documents(s, dir), n = 20),
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
          FROM documents
        ), g AS (
          SELECT doc_id, i AS pos, array_to_string(ws[i:i+19], ' ') AS gram
          FROM d, LATERAL (SELECT unnest(range(1, len(ws) - 18)) AS i)
          WHERE len(ws) >= 20
        ), dup AS (
          SELECT gram FROM g GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)
        ), m AS (
          SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)
        ), flagged AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > COALESCE(LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos), -1000000) + 19
                      THEN 1 ELSE 0 END AS new_span
          FROM m
        ), isl AS (
          SELECT doc_id, pos,
                 SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span
          FROM flagged
        )
        SELECT doc_id, MIN(pos) AS start_pos, MAX(pos) + 19 AS end_pos, COUNT(*) AS n_windows
        FROM isl
        GROUP BY doc_id, span
        ORDER BY doc_id, start_pos""")),

    Query(
      "q22_simhash",
      "SimHash near-dup pairs (Hamming ≤ 3 over 64-bit token-set SimHash): " +
        "4×16-bit chunk banding guarantees full recall at this radius via an " +
        "equi-join; bit_count(xor) verifies. Oracle (round-13 upgrade, the " +
        "q110 convention): the fingerprint hash family is Spark-specific " +
        "(xxhash64), so the deterministic spec-gated fingerprints are " +
        "staged as parquet and DuckDB recomputes the ENTIRE downstream " +
        "dedup from them — brute all-pairs bit_count(xor) <= 3 vs the " +
        "engine's banded equi-join, the banding losslessness theorem as " +
        "a driver-checked hash compare; the fingerprints themselves stay " +
        "cross-checked against the MinHash pairs in ScalaTest.",
      (s, dir) => {
        simhashOracleRoot =
          Some(new java.io.File(simhashStaged(s, dir)).getAbsolutePath)
        simhashNearDups(Tables.documents(s, dir), maxDist = 3)
      },
      oracleFn = Some(() => simhashOracleRoot.map(root => s"""
        WITH fp AS (
          SELECT doc_id, fp FROM read_parquet('$root/fp/*.parquet')
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        ORDER BY doc_a, doc_b"""))),

    Query(
      "q70_cross_dedup",
      "Incremental-ingest near-dedup: exact n-gram Jaccard >= 0.7 matches " +
        "of an incoming batch (doc_id%3=0) AGAINST the existing corpus " +
        "(doc_id%3<>0) — the gate that keeps a new crawl drop from " +
        "re-adding near-duplicates the corpus already holds. Lossless " +
        "prefix filtering with union-wide frequencies (both prefixes must " +
        "share ONE global token order); candidates are a plain prefix-hash " +
        "equi-join of corpus against batch — asymmetric by nature, so at " +
        "scale the day's small batch side broadcasts while the corpus " +
        "streams. Brute-force cross-Jaccard oracle over the gram strings.",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        crossJaccardMatches(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0),
          n = 3, tau = 0.7)
      },
      Some("""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
          FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
                FROM documents)
        ), sz AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS corpus_doc, b.doc_id AS batch_doc, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s
          WHERE a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
          GROUP BY 1, 2
        )
        SELECT corpus_doc, batch_doc,
               CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard
        FROM inter
        JOIN sz za ON za.doc_id = corpus_doc
        JOIN sz zb ON zb.doc_id = batch_doc
        WHERE CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) >= 0.7
        ORDER BY corpus_doc, batch_doc""")),

    Query(
      "q99_containment",
      "Asymmetric containment join (tau=0.8, 3-gram shingles): every " +
        "ordered pair where doc `inner` is mostly CONTAINED in doc " +
        "`outer` (|S_i n S_o|/|S_i| >= tau) — the quote/repost/" +
        "boilerplate-wrap duplication a Jaccard gate structurally " +
        "misses, because the container's length crushes the union. " +
        "Lossless one-sided prefix filter with the containment bound " +
        "(inner emits its floor((1-tau)*sz)+1 rare-first prefix, outer " +
        "its full gram stream — the q70/q93 shape, valid here precisely " +
        "because containment has no symmetric length prune); the one " +
        "sound prune (|S_o| >= tau*|S_i|) cuts candidates; exact verify " +
        "on candidates only. Grams travel as xxhash64; the oracle's " +
        "string-gram brute force doubles as the collision check.",
      (s, dir) => containmentJoin(Tables.documents(s, dir), n = 3, tau = 0.8),
      Some("""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
          FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
                FROM documents)
        ), sz AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
          GROUP BY 1, 2
        )
        SELECT inner_doc, outer_doc,
               CAST(i AS DOUBLE) / CAST(z.n AS DOUBLE) AS containment
        FROM inter JOIN sz z ON z.doc_id = inner_doc
        WHERE CAST(i AS DOUBLE) / CAST(z.n AS DOUBLE) >= 0.8
        ORDER BY inner_doc, outer_doc""")),

    Query(
      "q97_segment_dedup",
      "C4-style segment dedup with reassembly: documents split into " +
        "10-token segments, only the FIRST corpus-wide occurrence of " +
        "each distinct segment survives (first = min (doc_id, pos)), " +
        "and each document is rebuilt from its surviving segments in " +
        "order — strips repeated boilerplate while keeping the rest of " +
        "the document (q16 drops whole duplicate docs; q64 only reports " +
        "spans). Owner election is one segment-keyed map-side-combining " +
        "min-struct aggregate — never a per-segment window — so " +
        "ubiquitous segments die in the combine; reassembly state is " +
        "bounded by one document's own segments. Oracle replays the " +
        "segmentation, the (doc_id, pos) first-occurrence rule, and the " +
        "exact reassembled strings.",
      (s, dir) => segmentDedup(Tables.documents(s, dir), w = 10)
        .orderBy("doc_id"),
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
          FROM documents
        ), segs AS (
          SELECT doc_id,
                 unnest(range(0, CAST(CEIL(len(ws) / 10.0) AS BIGINT))) AS pos,
                 unnest(list_transform(range(0, CAST(CEIL(len(ws) / 10.0) AS BIGINT)),
                        i -> array_to_string(ws[i*10+1 : (i+1)*10], ' '))) AS seg
          FROM toks
        ), nseg AS (
          SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY doc_id
        ), ranked AS (
          SELECT doc_id, pos, seg,
                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
          FROM segs
        ), kept AS (
          SELECT doc_id, pos, seg FROM ranked WHERE rn = 1
        ), perdoc AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(seg, ' ' ORDER BY pos) AS text_kept
          FROM kept GROUP BY doc_id
        )
        SELECT n.doc_id, n.n_segments,
               COALESCE(p.n_kept, 0) AS n_kept,
               COALESCE(p.text_kept, '') AS text_kept
        FROM nseg n LEFT JOIN perdoc p USING (doc_id)
        ORDER BY n.doc_id""")))
}
