package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Serving over the persisted NN-descent kNN graph
  * ([[NnDescent.graphIndexStaged]]) — since round 14, ONE traversal
  * implementation ([[batchBeam]]) behind every serving entry:
  *
  *  - [[graphSearchBatch]] (q151, and q147 via its
  *    [[NnDescent.graphSearchStaged]] wrapper): batched beam search
  *    with ALL traversal state in ONE query-keyed DataFrame of
  *    constant-bounded arrays — per hop, ONE equi-join expands the
  *    frontier through the edge table (which CARRIES the destination
  *    vectors, see below) and scores inline, then one aggregate + one
  *    state join fold the proposals into each query's row (dedup /
  *    visited / beam cut as per-row array ops). A query table of any
  *    size is served in O(hops) jobs — one shuffle each — with NO
  *    per-query driver state. The r13 round kept a second,
  *    driver-orchestrated loop for interactive counts; r14 deleted it
  *    (two code paths for one algorithm invite drift — r13 verdict)
  *    and q147 became a small-nQueries wrapper over this machinery.
  *
  *  - [[graphSearchHierTrace]] (q152) / [[graphSearchHierBatch]]
  *    (q154): HNSW-style hierarchical entry points — level ℓ keeps
  *    nodes with xxhash64(id) ≡ 0 (mod 8^ℓ) (nested 1/8 decimation),
  *    an NN-descent graph per level, descent from the top level's
  *    min-hash entries carrying each query's best nodes down as the
  *    next level's entries. Each level graph has constant expected
  *    diameter, so total hops grow with the LEVEL COUNT — logarithmic
  *    in N. The descent runs EVERY layer at a 2× WORKING BEAM and
  *    cuts only the final answer to k (round-14: the r13 build-side
  *    working-beam lesson applied to serving — a serve-width descent
  *    funnels too few candidates through the layers, and any mid-walk
  *    contraction below the carried width marks good nodes visited
  *    without ever walking through them; tracked sf0.1 recall measured
  *    q152 0.70 / q154 0.62 under contraction vs ≥ 0.72 at full
  *    width). q152 runs each level TO CONVERGENCE (a hop that improves no
  *    query's running top-beam ends the level) and reports hop
  *    telemetry; q154 uses the fixed production budgets.
  *
  * Execution shape per hop (the round-14 fusion — r13 verdict item 6):
  * the staged edge table EMBEDS each destination's vector
  * (`d_emb`/`d_nrm`, written once at index-build time), so
  * expand+score is ONE equi-join followed by an inline cosine — the
  * per-hop corpus-keyed join against the vector table is gone
  * entirely, halving the corpus-sized tables touched per hop. The
  * K-way vector duplication (~K·dim·4 bytes per node) is the standard
  * graph-ANN locality trade (HNSW keeps vectors adjacent to adjacency
  * for exactly this reason); the vector table remains the source of
  * truth for entry scoring (one pruned touch per serve call, not per
  * hop). The frontier side of the expand join carries the
  * destination table's `nbucket` partition key, so Spark can prune
  * edge partitions dynamically when the query side broadcasts.
  *
  * All serving paths are design-gated (no oracle — the trajectory
  * depends on the learned graph): GraphServeSpec asserts wrapper==batch
  * identity, the recall bar (≥ 0.72, the IVF criterion), determinism,
  * and hop telemetry sanity.
  */
object GraphServe {

  // ---- the one traversal implementation ----

  /** Result of a batch traversal: each query's running top-`beam`
    * (query_id, node, score) — the final top-k is a prefix of it, and
    * the hierarchical descent carries it down as the next layer's
    * entries — plus the hop count consumed (the telemetry the
    * hierarchy's log-diameter claim is audited on). `bestF` is the
    * running top-beam over PREDICATE-MATCHING nodes only — non-null
    * exactly when the traversal ran with a `filterLab` (q157). */
  private[operators] final case class BatchTrace(best: DataFrame, hops: Int,
      bestF: DataFrame = null)

  /** SQL type of the (ns, node, lab, del) proposal struct: `ns` is the
    * NEGATED cosine so `sort_array`'s natural struct order (first
    * field asc, then the rest) is exactly the serving order (score
    * DESC, node ASC — `lab` and `del` are functionally dependent on
    * `node`, so they never decide a comparison); negation is exact in
    * IEEE, so `-ns` recovers the score bit-for-bit. `del` is the
    * tombstone flag (q164): false everywhere unless the traversal
    * runs under a delete set. */
  private val PropElemType = "struct<ns:double,node:bigint,lab:int,del:boolean>"
  private val PropType = s"array<$PropElemType>"

  /** The distributed beam loop over ONE edge table. ALL traversal
    * state lives in a single query-keyed frame — one row per query
    * holding its frontier, visited set, and running top-`beam` as
    * ARRAYS, each bounded by configuration constants (frontier/best ≤
    * beam; visited ≤ 1 + (hops+1)·beam·K), never by corpus or
    * query-table size. Per hop, exactly TWO relational operations:
    *
    *   1. EXPAND+SCORE — the exploded frontier (query vector riding
    *      along) meets the edge table in one equi-join; edge rows
    *      already CARRY the destination vector (see the object doc),
    *      so the cosine is an inline projection — no second join.
    *      Hop 0 uses the vector table to score the entries (the serve
    *      call's only per-call vecs touch).
    *   2. MERGE — one collect_list aggregate gathers each query's
    *      proposals (≤ beam·K structs — constant-bounded, the
    *      collect_list is NOT a skew risk), and one join back onto
    *      the state row folds them in with per-row array ops:
    *      array_distinct dedups, an array_contains filter drops
    *      visited nodes, sort_array+slice cuts the next frontier and
    *      the running top-beam. The r13 relational form paid an
    *      anti-join, a window, and two growing union chains per hop
    *      for the same bookkeeping (and a separate corpus-keyed
    *      vector join before the fusion); this is ONE shuffle per hop.
    *
    * The per-hop state checkpoint is the loop's single action, and
    * lineage is exactly one hop deep by construction — no re-rooting
    * cadence needed (the r13-advice union-chain cliff is gone with the
    * chains). The running top-beam makes a separate score accumulator
    * unnecessary: top-k of everything scored equals top-k of the
    * running top-beam whenever k ≤ beam (streaming top-k merge).
    *
    * With `converge`, the loop also stops once NO query's running
    * top-`beam` changed this hop (scores are deterministic per
    * (query, node), so set change is the only possible improvement —
    * computed as a per-row array comparison during the merge, read
    * back as one bounded emptiness probe per hop on the checkpointed
    * state); the serving entries use the fixed budget and pay zero
    * extra actions.
    *
    * With `filterLab` (q157 attribute-constrained search), the state
    * carries a SECOND running top-beam (`bestf`) holding only nodes
    * whose staged `d_lab` matches: the WALK stays predicate-agnostic —
    * non-matching nodes still navigate (filtering the traversal
    * fragments the graph under selective predicates, the known
    * filtered-HNSW failure mode) — while every matching node folds
    * into the filtered pool the hop it is first scored, so the answer
    * is the exact top of ALL matching nodes the walk ever scored. The
    * predicate test is a per-row array op on the edge-embedded label —
    * no per-hop attribute join. */
  private[operators] def batchBeam(edges: DataFrame, vecs: DataFrame,
      queries: DataFrame, entries: DataFrame, beam: Int,
      maxHops: Int, converge: Boolean = false,
      filterLab: Option[Int] = None,
      tombstones: Option[DataFrame] = None): BatchTrace = {
    val nb = lit(NnDescent.NodeBuckets)
    // With `tombstones` (q164 delete serving), the walk stays
    // predicate-agnostic — deleted nodes keep ROUTING (removing them
    // from traversal fragments the graph, the same filtered-HNSW
    // failure mode q157 avoids; HNSW soft-delete semantics) — and the
    // delete constrains COLLECTION via the same second-pool machinery
    // as filterLab: each surviving node folds into `bestf` the hop it
    // is first scored. The flag is attached to the expand view by ONE
    // broadcast join per serve call (tombstones are ids-only and tiny
    // relative to the corpus — once they are not, compaction is due),
    // so the per-hop plan gains no join at all.
    val tsFlag = tombstones.map(t => broadcast(
      t.select(col("vec_id").as("ts_id"), lit(true).as("ts_hit"))))
    def withDel(df: DataFrame, idCol: String): DataFrame = tsFlag match {
      case Some(t) => df.join(t, df(idCol) === t("ts_id"), "left")
        .withColumn("d_del", coalesce(col("ts_hit"), lit(false)))
        .drop("ts_id", "ts_hit")
      case None => df.withColumn("d_del", lit(false))
    }
    // expand view: node = src, destination vector embedded at stage
    // time; nbucket is the partition key of the staged layout — the
    // frontier side computes it too, so the join key includes it and
    // partition pruning can act on the scan
    val edgesN = withDel(edges.select(col("nbucket"), col("src").as("node"),
      col("dst"), col("d_emb"), col("d_nrm"), col("d_lab")), "dst")
    val vecsN = withDel(vecs.select(col("nbucket"), col("vec_id").as("node"),
      col("emb").as("d_emb"), col("nrm").as("d_nrm"),
      col("lab").as("d_lab")), "node")
    // the one result-pool predicate (over the proposal struct): label
    // equality (q157) or tombstone survival (q164) — mutually
    // exclusive by construction (no caller needs both today)
    val resultPred: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      filterLab.map(l => (p: org.apache.spark.sql.Column) => p("lab") === lit(l))
        .orElse(tombstones.map(_ =>
          (p: org.apache.spark.sql.Column) => !p("del")))

    // state: ONE row per query. Every array is bounded by configuration
    // constants — frontier ≤ beam, best ≤ beam, visited ≤ 1 + (hops+1)·
    // beam·K — independent of corpus and query-table size, so the
    // per-row work below never scales with N or |Q|.
    var state = queries.join(
        entries.groupBy("query_id").agg(
          collect_list(col("node")).as("frontier")),
        Seq("query_id"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        col("frontier"),
        array(col("query_id")).as("visited"),
        array().cast(PropType).as("best"),
        array().cast(PropType).as("bestf"),
        lit(true).as("changed"))
      .localCheckpoint(false)

    var hop = 0
    var improved = true
    while (hop <= maxHops && improved) {
      // expand + attach destination vectors + score, in ONE equi-join:
      // the exploded frontier meets the edge table (hop 0: the vector
      // table — the entry nodes themselves), whose rows already carry
      // the destination vector, and the query vector rides the explode
      val fr = state.select(col("query_id"), col("q_emb"), col("q_nrm"),
          explode(col("frontier")).as("node"))
        .withColumn("nbucket", pmod(col("node"), nb).cast("int"))
      val cand =
        if (hop == 0) fr.join(vecsN, Seq("nbucket", "node"))
        else fr.join(edgesN, Seq("nbucket", "node"))
          .withColumn("node", col("dst"))
      val props = cand
        .select(col("query_id"), struct(
          (-Similarity.cosine(col("q_emb"), col("q_nrm"), col("d_emb"),
            col("d_nrm"))).as("ns"), col("node"),
          col("d_lab").as("lab"), col("d_del").as("del")).as("p"))
        .groupBy("query_id").agg(collect_list(col("p")).as("props"))
      // merge: dedup proposals, drop visited, fold into the running
      // top-beam, cut the next frontier — all per-row array ops over
      // constant-bounded arrays (no anti-join, no window, no union
      // chain; ONE shuffle per hop — the props aggregate — and one
      // broadcast-sized join back onto the state)
      val fresh = filter(
        array_distinct(coalesce(col("props"), array().cast(PropType))),
        p => !array_contains(col("visited"), p("node")))
      // filtered pool fold: matching nodes enter `bestf` the hop they
      // are first scored (fresh excludes re-visits; a node folds at
      // most once, and the running merge keeps the exact top of all
      // matching nodes ever scored). Without a filter the column
      // stays the empty array — zero per-row work.
      val bestfNext = resultPred match {
        case Some(pred) => slice(sort_array(concat(col("bestf"),
          filter(col("fresh"), pred))), 1, beam)
        case None => col("bestf")
      }
      // the adaptive stop's change signal must also watch the filtered
      // pool when one is active: navigation can keep improving `bestf`
      // without changing `best` (round-14 advice — the latent
      // converge × filter interaction)
      val changedNext =
        if (resultPred.isDefined)
          not(col("pool") === col("best")) ||
            not(bestfNext === col("bestf"))
        else not(col("pool") === col("best"))
      state = state.join(props, Seq("query_id"), "left")
        .withColumn("fresh", fresh)
        .withColumn("pool",
          slice(sort_array(concat(col("best"), col("fresh"))), 1, beam))
        .select(col("query_id"), col("q_emb"), col("q_nrm"),
          transform(slice(sort_array(col("fresh")), 1, beam),
            p => p("node")).as("frontier"),
          concat(col("visited"),
            transform(col("fresh"), p => p("node"))).as("visited"),
          col("pool").as("best"),
          bestfNext.as("bestf"),
          changedNext.as("changed"))
        .localCheckpoint(false)
      // adaptive stop (trace paths only): a hop where no query's
      // running top-beam changed ends the loop — one bounded action
      // over the just-checkpointed state; the serving entries use the
      // fixed budget and pay zero extra actions
      if (converge)
        improved = !state.filter(col("changed")).isEmpty
      hop += 1
    }
    BatchTrace(bestOf(state, "best"), hop,
      if (resultPred.isDefined) bestOf(state, "bestf") else null)
  }

  /** A running top-beam of a traversal state, exploded back to the
    * relational (query_id, node, score) form callers cut or carry. */
  private def bestOf(state: DataFrame, pool: String = "best"): DataFrame =
    state.select(col("query_id"), explode(col(pool)).as("p"))
      .select(col("query_id"), col("p.node").as("node"),
        (-col("p.ns")).as("score"))

  // ---- oracle replay of the traversal (round-14 upgrade) ----

  /** (index root, staged-entries root) the last flat batch-oracle runs
    * served from, keyed by query count — late-bound into the q151
    * (nQueries=100) and q147 (nQueries=10) SQL twins; a shared Option
    * would let whichever entry ran last clobber the other's staged
    * entry root. */
  @volatile private[graft] var graphOracleRoots: Map[Int, (String, String)] = Map.empty

  /** (index root, staged-entries root) of the last q157 filtered run. */
  @volatile private[graft] var graphFilteredOracleRoots: Option[(String, String)] = None

  /** (index root, hier root, levels top-first) of the last q154 run. */
  @volatile private[graft] var hierOracleInfo: Option[(String, String, Seq[Int])] = None

  /** Same for the q155 post-append hierarchy run. */
  @volatile private[graft] var hierAppendOracleInfo: Option[(String, String, Seq[Int])] = None

  /** (index root, hier root, levels top-first, per-layer REALIZED
    * iteration counts, query count) of the last q152 converge-mode
    * trace — the realized counts are what its oracle replays (see
    * [[hierServe]]'s doc on why an exact-length unrolled chain
    * reproduces the adaptive walk). */
  @volatile private[graft] var hierTraceOracleInfo: Option[(String, String, Seq[Int], Seq[Int], Int)] = None

  /** (fp index root, sq8 root, staged-entries root) of the last q158
    * run. */
  @volatile private[graft] var sq8OracleRoots: Option[(String, String, String)] = None

  /** The batched beam traversal as ANSI SQL — the [[batchBeam]] loop
    * UNROLLED hop by hop into chained CTEs over the staged index (the
    * hop budget is a fixed configuration constant, so the loop is
    * finite and the unrolling is mechanical). Each hop replays the
    * exact merge semantics: full-row DISTINCT stands in for the
    * struct `array_distinct` (ns/lab are functionally dependent on
    * (query, node), so row-distinct ≡ struct-distinct), `list_sort`
    * over (ns, node, lab) structs is the same lexicographic serving
    * order (ns = negated cosine), and the scores ride
    * `list_dot_product` (the q19 bit-stability precedent). The ONE
    * non-SQL ingredient — the xxhash64 entry-slot draw — is itself a
    * spec-gated deterministic frame (`entrySlotHash` twin test) and
    * stages as parquet next to the index, so the oracle reads the
    * same entry bytes the engine serves from. collect_list order
    * never matters: every consumer of the gathered proposals is
    * either sorted or set-semantics (the argument in [[batchBeam]]'s
    * doc), which is what makes a SQL replay possible at all. */
  private val EmptyProps =
    "CAST([] AS STRUCT(ns DOUBLE, node BIGINT, lab INTEGER, del BOOLEAN)[])"

  /** One unrolled [[batchBeam]] hop chain as CTE text: assumes a CTE
    * `${pfx}_init` with (query_id, q_emb, q_nrm, frontier, visited,
    * best[, bestf]) exists; emits `cand/p/s` CTEs `${pfx}_0 ..
    * ${pfx}_$hops` replaying the exact merge semantics (full-row
    * DISTINCT ≡ struct array_distinct because ns/lab are functionally
    * dependent on (query, node); list_sort over (ns, node, lab) is
    * the serving order; every consumer of the gathered proposals is
    * sorted or set-semantics, so collect_list order cannot matter —
    * which is what makes a SQL replay possible at all). Hop 0 scores
    * the entry nodes via `vecs`; later hops expand through
    * `$edgesRel`. */
  private def hopChainSql(pfx: String, edgesRel: String, beam: Int,
      hops: Int, filterExpr: Option[String],
      tsRel: Option[String] = None): String = {
    def fresh = s"""list_filter(coalesce(p.props, $EmptyProps),
                 x -> NOT list_contains(s.visited, x.node))"""
    def bestfNext = filterExpr match {
      case Some(fe) =>
        s""",
             list_slice(list_sort(s.bestf ||
               list_filter($fresh, x -> $fe)), 1, $beam) AS bestf"""
      case None => ""
    }
    // tombstone flag: a plain IN-subquery in the projection (q164) —
    // constant FALSE when no delete set rides the traversal, so the
    // non-delete oracles replay the same semantics as before
    def delExpr(id: String) = tsRel
      .map(r => s"($id IN (SELECT vec_id FROM $r))").getOrElse("FALSE")
    (0 to hops).map { i =>
      val prev = if (i == 0) s"${pfx}_init" else s"${pfx}_${i - 1}"
      val cand =
        if (i == 0) s"""
        cand_${pfx}_0 AS MATERIALIZED (
          SELECT s.query_id,
                 -(list_dot_product(s.q_emb, v.emb) / (s.q_nrm * v.nrm)) AS ns,
                 v.vec_id AS node, CAST(v.lab AS INTEGER) AS lab,
                 ${delExpr("v.vec_id")} AS del
          FROM ${pfx}_init s, UNNEST(s.frontier) AS u(fn)
          JOIN vecs v ON v.vec_id = u.fn)"""
        else s"""
        cand_${pfx}_$i AS MATERIALIZED (
          SELECT s.query_id,
                 -(list_dot_product(s.q_emb, ed.d_emb) / (s.q_nrm * ed.d_nrm)) AS ns,
                 ed.dst AS node, CAST(ed.d_lab AS INTEGER) AS lab,
                 ${delExpr("ed.dst")} AS del
          FROM $prev s, UNNEST(s.frontier) AS u(fn)
          JOIN $edgesRel ed ON ed.src = u.fn)"""
      s"""$cand,
        p_${pfx}_$i AS MATERIALIZED (
          SELECT query_id,
                 list(struct_pack(ns := ns, node := node, lab := lab,
                                  del := del)) AS props
          FROM (SELECT DISTINCT query_id, ns, node, lab, del FROM cand_${pfx}_$i)
          GROUP BY query_id),
        ${pfx}_$i AS MATERIALIZED (
          SELECT s.query_id, s.q_emb, s.q_nrm,
                 list_transform(list_slice(list_sort($fresh), 1, $beam),
                   x -> x.node) AS frontier,
                 s.visited || list_transform($fresh, x -> x.node) AS visited,
                 list_slice(list_sort(s.best || $fresh), 1, $beam) AS best$bestfNext
          FROM $prev s
          LEFT JOIN p_${pfx}_$i p USING (query_id))"""
    }.mkString(",")
  }

  /** Shared prologue: the query frame (ids drawn from the staged
    * entry/top frame's query set) and the fp vector CTE. */
  private def probePrologue(vecsGlob: String, querySrc: String): String = s"""
        vecs AS MATERIALIZED (
          SELECT vec_id, emb, nrm, lab
          FROM read_parquet('$vecsGlob', hive_partitioning=1)
        ),
        e0 AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS MATERIALIZED (SELECT vec_id AS query_id, v AS q_emb,
                     sqrt(list_dot_product(v, v)) AS q_nrm
              FROM e0 WHERE vec_id IN ($querySrc))"""

  private def finalCut(stateCte: String, pool: String, k: Int): String = s"""
        SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score
        FROM (
          SELECT s.query_id, t.x.node AS neighbor_id, -t.x.ns AS score,
                 row_number() OVER (PARTITION BY s.query_id
                   ORDER BY -t.x.ns DESC, t.x.node) AS rn
          FROM $stateCte s, UNNEST(s.$pool) AS t(x))
        WHERE rn <= $k
        ORDER BY query_id, rank"""

  /** The FLAT batched traversal as ANSI SQL — [[batchBeam]] unrolled
    * hop by hop into chained CTEs over the staged index; the ONE
    * non-SQL ingredient (the xxhash64 entry-slot draw) is itself a
    * spec-gated deterministic frame and stages as parquet, so the
    * oracle reads the same entry bytes the engine serves from. */
  private[operators] def graphProbeSql(edgesGlob: String, vecsGlob: String,
      entriesGlob: String, beam: Int, hops: Int, k: Int,
      filterLab: Option[Int] = None,
      tombstoneGlob: Option[String] = None): String = {
    // result-pool predicate over the proposal struct: label equality
    // (q157) or tombstone survival (q164) — mirrors batchBeam's
    // resultPred exactly
    val filterExpr = filterLab.map(l => s"x.lab = $l")
      .orElse(tombstoneGlob.map(_ => "NOT x.del"))
    val bestfInit =
      if (filterExpr.isDefined) s",\n                 $EmptyProps AS bestf" else ""
    val pool = if (filterExpr.isDefined) "bestf" else "best"
    val tsCte = tombstoneGlob.map(g => s"""
        ts AS MATERIALIZED (
          SELECT vec_id FROM read_parquet('$g')
        ),""").getOrElse("")
    s"""
        WITH$tsCte edges AS MATERIALIZED (
          SELECT src, dst, d_emb, d_nrm, d_lab
          FROM read_parquet('$edgesGlob', hive_partitioning=1)
        ),
        en AS MATERIALIZED (
          SELECT query_id, list(node) AS frontier
          FROM read_parquet('$entriesGlob') GROUP BY query_id
        ),${probePrologue(vecsGlob, "SELECT query_id FROM en")},
        f_init AS MATERIALIZED (
          SELECT q.query_id, q.q_emb, q.q_nrm, en.frontier,
                 [q.query_id] AS visited,
                 $EmptyProps AS best$bestfInit
          FROM q JOIN en USING (query_id)),${hopChainSql("f", "edges", beam, hops,
            filterExpr, tombstoneGlob.map(_ => "ts"))}
        ${finalCut(s"f_$hops", pool, k)}"""
  }

  /** The HIERARCHICAL descent as ANSI SQL — [[hierServe]] unrolled:
    * every query starts at the staged top entries (a staged table, no
    * hash needed), each upper layer runs its own unrolled hop chain
    * at the working beam over that layer's staged edges, the carried
    * per-query best re-enters the next layer as its entry frontier
    * (re-scored at that layer's hop 0 via the vecs CTE — exactly the
    * carry-down induction the engine relies on), and the base layer
    * gets the full budget. `layerGlobs` are ordered top level first,
    * base last; `upperBudgets` gives each upper layer its OWN hop
    * budget (the q154/q155 fixed-budget twins pass a constant; the
    * q152 converge-mode twin passes the realized per-layer counts). */
  private def hierProbeSql(layerGlobs: Seq[String], baseEdgesGlob: String,
      vecsGlob: String, topGlob: String, workBeam: Int,
      upperBudgets: Seq[Int], baseBudget: Int, k: Int,
      queryPred: String): String = {
    require(upperBudgets.size == layerGlobs.size,
      s"${layerGlobs.size} layers need ${layerGlobs.size} budgets, got ${upperBudgets.size}")
    val allLayers = layerGlobs.zip(upperBudgets).zipWithIndex.map {
      case ((g, b), j) => (s"l$j", s"edges_l$j", g, b)
    } :+ (("base", "edges_base", baseEdgesGlob, baseBudget))
    val edgeCtes = allLayers.map { case (_, rel, g, _) => s"""
        $rel AS MATERIALIZED (
          SELECT src, dst, d_emb, d_nrm, d_lab
          FROM read_parquet('$g', hive_partitioning=1)
        )""" }.mkString(",")
    val chains = allLayers.zipWithIndex.map { case ((pfx, rel, _, budget), j) =>
      val init =
        if (j == 0) s"""
        ${pfx}_init AS MATERIALIZED (
          SELECT q.query_id, q.q_emb, q.q_nrm, en.frontier,
                 [q.query_id] AS visited,
                 $EmptyProps AS best
          FROM q JOIN en USING (query_id))"""
        else {
          val (ppfx, _, _, pbudget) = allLayers(j - 1)
          s"""
        ${pfx}_init AS MATERIALIZED (
          SELECT s.query_id, s.q_emb, s.q_nrm,
                 list_transform(s.best, x -> x.node) AS frontier,
                 [s.query_id] AS visited,
                 $EmptyProps AS best
          FROM ${ppfx}_$pbudget s)"""
        }
      s"$init,${hopChainSql(pfx, rel, workBeam, budget, None)}"
    }.mkString(",")
    s"""
        WITH$edgeCtes,${probePrologue(vecsGlob, queryPred)},
        en AS MATERIALIZED (
          SELECT q.query_id, list(t.entry_id) AS frontier
          FROM q, read_parquet('$topGlob') t
          WHERE t.entry_id <> q.query_id
          GROUP BY q.query_id
        ),$chains
        ${finalCut(s"base_$baseBudget", "best", k)}"""
  }

  /** The SQ8 serving path as ANSI SQL — the flat unrolled chain over
    * the QUANTIZED edge table (dequantized inline from the staged
    * bounds row, the same ((code*span)/255)+mn arithmetic the engine
    * runs) followed by the full-precision re-rank of the bounded
    * pool against the fp vecs table. */
  private def sq8ProbeSql(qedgesGlob: String, boundsGlob: String,
      vecsGlob: String, entriesGlob: String, beam: Int, hops: Int,
      k: Int): String = s"""
        WITH bounds AS MATERIALIZED (
          SELECT mns, spans FROM read_parquet('$boundsGlob')
        ),
        edges AS MATERIALIZED (
          SELECT src, dst, CAST(d_lab AS INTEGER) AS d_lab,
                 list_transform(list_zip(d_codes,
                     (SELECT mns FROM bounds), (SELECT spans FROM bounds)),
                   t -> t[1] * t[3] / 255.0 + t[2]) AS d_emb,
                 d_nrm_hat AS d_nrm
          FROM read_parquet('$qedgesGlob', hive_partitioning=1)
        ),
        en AS MATERIALIZED (
          SELECT query_id, list(node) AS frontier
          FROM read_parquet('$entriesGlob') GROUP BY query_id
        ),${probePrologue(vecsGlob, "SELECT query_id FROM en")},
        f_init AS MATERIALIZED (
          SELECT q.query_id, q.q_emb, q.q_nrm, en.frontier,
                 [q.query_id] AS visited,
                 $EmptyProps AS best
          FROM q JOIN en USING (query_id)),${hopChainSql("f", "edges", beam, hops, None)},
        pool AS MATERIALIZED (
          SELECT s.query_id, t.x.node AS neighbor_id
          FROM f_$hops s, UNNEST(s.best) AS t(x)),
        rescored AS (
          SELECT p.query_id, p.neighbor_id,
                 list_dot_product(q.q_emb, v.emb) / (q.q_nrm * v.nrm)
                   AS score
          FROM pool p
          JOIN q USING (query_id)
          JOIN vecs v ON p.neighbor_id = v.vec_id)
        SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rn FROM rescored)
        WHERE rn <= $k
        ORDER BY query_id, rank"""

  /** Stage a deterministic per-query entry frame next to the index so
    * the SQL twin reads the SAME entry bytes the engine serves from
    * (the xxhash64 slot draw has no SQL twin; the frame does). */
  private def stagedEntries(spark: SparkSession, root: String,
      queries: DataFrame, beam: Int, tag: String): String = {
    val eroot = "target/nndescent/graft_gse_" + Bucketed.md5hex(
      s"$root/e1/$tag/$beam").take(8)
    Staging.ensure(spark, eroot) { tmp =>
      entriesBatch(spark, queries, root, beam)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    eroot
  }

  // ---- q151 (and q147 via wrapper): flat batched serving ----

  /** Batched graph-ANN serving for the query set `vec_id < nQueries`
    * (the shared ANN convention): hop 0 scores the entry nodes, each
    * later hop expands the previous hop's per-query top-`beam`,
    * visited nodes are never re-scored, and the answer is the top-`k`
    * of everything scored. q147 calls this at interactive nQueries —
    * same machinery, same answer (the unification is spec-pinned). */
  def graphSearchBatch(spark: SparkSession, dir: String, nQueries: Int,
      k: Int, beam: Int = 8, hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val edges = spark.read.parquet(s"$root/edges")
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    serveBatch(spark, edges, vecs, queries, root, k, beam, hops)
  }

  /** Serving over a query frame of (query_id, embedding) — the entry
    * point the STREAMING deployment feeds each arriving micro-batch
    * through ([[graft.streaming.AnnServeStream]]): the index is
    * write-once and the traversal machinery is identical, so an online
    * query stream and an offline query table get the same answer by
    * construction (spec-pinned row for row).
    *
    * Query-id contract (round-14 advice): the traversal seeds each
    * query's visited set with its own `query_id` (self-exclusion — a
    * corpus vector querying for neighbors must not answer itself), so
    * `query_id`s must either BE corpus `vec_id`s (the spec-pinned
    * case) or be drawn from an id space DISJOINT from `vec_id` — an
    * arbitrary online id that happens to collide with an unrelated
    * corpus id would silently exclude that one corpus node from its
    * answers. */
  def graphSearchBatchOver(spark: SparkSession, dir: String,
      rawQueries: DataFrame, k: Int, beam: Int = 8,
      hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val queries = Similarity.prepared(
        rawQueries.select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    serveBatch(spark, spark.read.parquet(s"$root/edges"),
      spark.read.parquet(s"$root/vecs"), queries, root, k, beam, hops)
  }

  /** q151's catalog form: the flat batch serve with its entry frame
    * STAGED (so the SQL twin reads the same bytes) and the oracle
    * roots published. Answer identical to [[graphSearchBatch]] — the
    * staged frame IS the [[entriesBatch]] frame, materialized. */
  def graphSearchBatchOracle(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val edges = spark.read.parquet(s"$root/edges")
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val workBeam = DescentWorkFactor * beam
    val eroot = stagedEntries(spark, root, queries, workBeam, s"q$nQueries")
    graphOracleRoots += nQueries -> ((Staging.abs(root), Staging.abs(eroot)))
    serveBatch(spark, edges, vecs, queries, root, k, beam, hops,
      entriesOpt = Some(spark.read.parquet(eroot)))
  }

  /** Entry selection + the beam loop + the final cut, over an
    * arbitrary query table. AQE broadcasts the query side when it is
    * small, and shuffles co-partition both sides when it is not — the
    * same plan a 1000-executor deployment wants.
    *
    * Since round 16 the FLAT walk runs at the 2× WORKING BEAM
    * ([[DescentWorkFactor]]) and cuts to k at the end — the r15
    * verdict's recall item: the serve-width flat default shipped
    * recall@5 0.74 while the engine's own measured frontier had
    * workFactor=2 at ~0.92 for ~2× the per-hop work; the filtered
    * (q157), delete (q164), and hierarchical (q152/q154) walks
    * already ran at this width, so this also removes the one serving
    * path that contracted mid-walk. */
  private def serveBatch(spark: SparkSession, edges: DataFrame,
      vecs: DataFrame, queries: DataFrame, root: String, k: Int,
      beam: Int, hops: Int, entriesOpt: Option[DataFrame] = None): DataFrame = {
    val workBeam = DescentWorkFactor * beam
    require(k <= workBeam,
      s"top-k $k must fit inside the working beam $workBeam")
    val entries = entriesOpt.getOrElse(
      entriesBatch(spark, queries, root, workBeam))
    val tr = batchBeam(edges, vecs, queries, entries, workBeam, hops)
    Similarity.topKBounded(
      tr.best.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")),
      k)
  }

  /** Per-query entry nodes from the staged per-bucket sample of REAL
    * node ids: `beam` xxhash64(query_id, j, 'gs-entry') slots over the
    * sample list (≤ NodeBuckets rows — an INDEX-scale constant, so the
    * driver read is bounded), the query's own id excluded. The same
    * hash [[NnDescent.entrySlotHash]] evaluates on literals, so any
    * driver-side consumer picks identical entries by construction. */
  private def entriesBatch(spark: SparkSession, queries: DataFrame,
      root: String, beam: Int): DataFrame = {
    import spark.implicits._
    val entryIds = NnDescent.readEntrySample(spark, root)
    val entryDf = broadcast(entryIds.zipWithIndex
      .map { case (id, i) => (i.toLong, id) }.toDF("slot", "entry_id"))
    queries.select("query_id")
      .select(col("query_id"), explode(sequence(lit(1), lit(beam))).as("j"))
      .select(col("query_id"),
        pmod(xxhash64(col("query_id"), col("j"), lit("gs-entry")),
          lit(entryIds.length.toLong)).as("slot"))
      .join(entryDf, "slot")
      .where(col("entry_id") =!= col("query_id"))
      .select(col("query_id"), col("entry_id").as("node"))
      .distinct()
  }

  // ---- q152/q154: hierarchical (HNSW-style) entry points ----

  /** Expected decimation per level: level ℓ keeps ids with
    * xxhash64(id, 'nn-hier') ≡ 0 (mod 8^ℓ) — nested by divisibility. */
  val HierDecimation = 8

  /** Smallest population a level may hold (NN-descent needs > K nodes
    * and a few dozen make the level graph meaningful). */
  val MinLevelNodes = 24

  /** How many min-hash top-level nodes seed every query's descent. */
  val TopEntries = 4

  /** Working-beam factor every descent layer runs at (only the final
    * answer cuts to k) — the r13 build-side lesson applied to serving;
    * see the object doc. */
  val DescentWorkFactor = 2

  private def pow(b: Int, e: Int): Long = (1 to e).foldLeft(1L)((a, _) => a * b)

  private[graft] def levelMember(l: Int) =
    pmod(xxhash64(col("vec_id"), lit("nn-hier")), lit(pow(HierDecimation, l))) === 0

  /** Write-once content-keyed layer hierarchy next to the base graph
    * index: `layer_ℓ/` NN-descent graphs over each decimated level
    * (same nbucket layout + embedded destination vectors as the base,
    * so one serving plan covers every layer), `top/` the top level's
    * [[TopEntries]] min-hash entry nodes, `meta/` the (level, n)
    * table. Total extra build cost is Σ (N/8^ℓ)·cap² ≤ N·cap²/7 — a
    * seventh of one base round. */
  def graphHierStaged(spark: SparkSession, dir: String): String =
    hierStaged(spark, dir, tag = "full", pred = None)

  /** Write-once hierarchy over the BASE slice (`vec_id % 10 != 0`, the
    * q109/q148 split convention) — what [[graphHierAppendStaged]]
    * maintains when the `% 10 == 0` arrivals land. Same layout as the
    * full hierarchy. */
  def graphHierBaseStaged(spark: SparkSession, dir: String): String =
    hierStaged(spark, dir, tag = "base10",
      pred = Some(col("vec_id") % 10 =!= 0))

  private def hierStaged(spark: SparkSession, dir: String, tag: String,
      pred: Option[org.apache.spark.sql.Column]): String = {
    // h4: layer layout carries embedded dst vectors (round 14) and the
    // payload attribute d_lab (q157 filtered search); the key also
    // folds EVERY layout constant — MinLevelNodes and TopEntries
    // included (r13 advice: changing either must not silently serve a
    // stale level count or entry set)
    val out = "target/nndescent/graft_nnh_" + Bucketed.md5hex(
      s"$dir/h7/$tag/k${NnDescent.K}/w${NnDescent.WorkFactor}/d$HierDecimation" +
        s"/m$MinLevelNodes/t$TopEntries" +
        s"/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val emb0 = Tables.embeddings(spark, dir)
      val emb = pred.map(emb0.filter).getOrElse(emb0)
      val e = Similarity.preparedLab(emb)
      // per-level populations in ONE aggregate pass (probe depth 8 ≫
      // any real level count: level 8 would need 8^8 ≈ 16M-fold data)
      val counts = levelCounts(e)
      val levels = (1 to counts.size).takeWhile(l => counts(l - 1) >= MinLevelNodes)
      val topLevel = levels.lastOption.getOrElse(0)
      levels.foreach { l =>
        NnDescent.writeServingEdges(
          NnDescent.build(emb.filter(levelMember(l)), k = NnDescent.K,
            nKnown = counts(l - 1)),
          e, s"$tmp/layer_$l")
      }
      // descent entries: the top level's min-(hash, id) nodes — REAL
      // ids only (the q151/q147 entry discipline); when no level
      // clears MinLevelNodes the corpus itself is the top level
      val topPool = if (topLevel == 0) e else e.filter(levelMember(topLevel))
      writeTopEntries(topPool, s"$tmp/top")
      writeHierMeta(spark, levels.map(l => (l, counts(l - 1))), s"$tmp/meta")
    }
    out
  }

  /** Per-level populations in one aggregate pass. */
  private def levelCounts(e: DataFrame, maxProbe: Int = 8): Seq[Long] = {
    val cntRow = e.select((1 to maxProbe).map(l =>
      sum(when(levelMember(l), 1L).otherwise(0L)).as(s"c$l")): _*).head()
    (1 to maxProbe).map(l => cntRow.getLong(l - 1))
  }

  private def writeHierMeta(spark: SparkSession, rows: Seq[(Int, Long)],
      path: String): Unit = {
    import spark.implicits._
    rows.toDF("level", "n").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  // ---- q155: hierarchical index APPEND (maintenance) ----

  /** Idempotent post-append hierarchy — the maintenance op that was
    * missing from the graph family (r13 verdict item 3): q148 inserts
    * delta nodes into the FLAT graph, but the q152/q154 level graphs
    * were built once with no append path, so after any ingest the
    * hierarchical probes served a stale level structure that neither
    * contained nor routed to the new nodes. The IVF family has all
    * three maintenance ops (q109 append / q124 compact / q125
    * retrain); this completes the pair for the hierarchy.
    *
    * Level membership is a PURE HASH TEST (xxhash64(id) ≡ 0 mod 8^ℓ),
    * so each delta node's levels are deterministic and id-agnostic —
    * no coin-flip state to persist, and the nested-divisibility
    * invariant survives appends by construction. The insert is the
    * q148 batch walk applied per level:
    *
    *   - layer 0: [[NnDescent.appendToGraph]] over the full corpus
    *     against the staged CONVERGED base graph — delta-sized walk
    *     rounds, never a scratch rebuild;
    *   - level ℓ ≥ 1 present in the base hierarchy: the same walk
    *     INSIDE the level population (base level graph + the delta
    *     nodes hashing into ℓ — an expected 1/8^ℓ of the delta); a
    *     level whose delta slice is empty just takes the walk's final
    *     symmetric refinement round;
    *   - a level the base hierarchy LACKS (the delta pushed its
    *     population past [[MinLevelNodes]]): built from scratch at
    *     level size — N/8^ℓ nodes, a cost that shrinks geometrically;
    *   - top entries: recomputed over the appended top level (the
    *     min-hash rule is order-free, so this is one bounded pass).
    *
    * Total append cost is delta-sized at layer 0 plus geometrically
    * shrinking level terms — the base corpus is never rebuilt. Layers
    * are written in the serving layout (embedded destination vectors),
    * so [[hierServe]] runs unchanged against the appended root.
    * Design-gated in GraphServeSpec: post-append recall over a mixed
    * base+delta query set (delta subset asserted separately), the
    * staleness differential (the base hierarchy provably contains no
    * delta node in any table the search reads), determinism, and
    * idempotent staging. */
  def graphHierAppendStaged(spark: SparkSession, dir: String): String = {
    val out = "target/nndescent/graft_nnha_" + Bucketed.md5hex(
      s"$dir/a5/k${NnDescent.K}/w${NnDescent.WorkFactor}/d$HierDecimation" +
        s"/m$MinLevelNodes/t$TopEntries" +
        s"/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val emb = Tables.embeddings(spark, dir)
      val e = Similarity.preparedLab(emb)
      val deltaPred = col("vec_id") % 10 === 0
      // layer 0: the q148 delta walk against the staged converged
      // base — REUSED from the staged flat append (round 17: one
      // append walk serves q148's oracle, this hierarchy, and any
      // future flat consumer) rather than recomputed here
      NnDescent.writeServingEdges(
        spark.read.parquet(NnDescent.appendedGraphStaged(spark, dir)),
        e, s"$tmp/edges")
      // appended level populations (counts over the union corpus)
      val counts = levelCounts(e)
      val levels = (1 to counts.size).takeWhile(l => counts(l - 1) >= MinLevelNodes)
      val baseHroot = graphHierBaseStaged(spark, dir)
      val baseLevels = spark.read.parquet(s"$baseHroot/meta")
        .select("level").collect().map(_.getInt(0)).toSet
      levels.foreach { l =>
        val levelEmb = emb.filter(levelMember(l))
        val g =
          if (baseLevels.contains(l))
            NnDescent.appendToGraph(levelEmb,
              spark.read.parquet(s"$baseHroot/layer_$l")
                .select("src", "dst", "score"),
              deltaPred, nKnown = counts(l - 1))
          else
            NnDescent.build(levelEmb, k = NnDescent.K,
              nKnown = counts(l - 1))
        NnDescent.writeServingEdges(g, e, s"$tmp/layer_$l")
      }
      val topLevel = levels.lastOption.getOrElse(0)
      val topPool = if (topLevel == 0) e else e.filter(levelMember(topLevel))
      writeTopEntries(topPool, s"$tmp/top")
      writeHierMeta(spark, levels.map(l => (l, counts(l - 1))), s"$tmp/meta")
    }
    out
  }

  /** Hierarchical serving over the APPENDED hierarchy — the exact
    * q154 descent pointed at the maintained artifact, so post-ingest
    * queries (delta nodes included) are served by the same machinery
    * with no code fork. */
  def graphSearchHierAppended(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hopsPerLevel: Int = 2,
      hops: Int = 8): DataFrame = {
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val aroot = graphHierAppendStaged(spark, dir)
    hierAppendOracleInfo = Some((Staging.abs(root0), Staging.abs(aroot),
      spark.read.parquet(s"$aroot/meta").select("level")
        .collect().map(_.getInt(0)).sorted.reverse.toSeq))
    val vecs = spark.read.parquet(s"$root0/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    hierServe(spark, aroot, spark.read.parquet(s"$aroot/edges"), vecs,
      queries, k, beam, upperBudget = hopsPerLevel, baseBudget = hops,
      converge = false)._1
  }

  // ---- q157: attribute-constrained (filtered) graph search ----

  /** Attribute-constrained graph-ANN serving — "nearest neighbors
    * WHERE label = ?" over the persisted NN-descent index, the graph
    * twin of q156's partition-pruned IVF design. The two compose
    * opposite selectivity regimes: the IVF layout prunes label
    * subtrees BEFORE scoring (best when the predicate is very
    * selective and lists are label-partitioned), while the graph walk
    * must stay PREDICATE-AGNOSTIC — restricting traversal to matching
    * nodes fragments the graph and strands the walk (the known
    * filtered-HNSW failure mode; cf. ACORN's predicate-agnostic
    * traversal) — so the predicate constrains COLLECTION instead:
    * edge rows carry the staged `d_lab` payload (attribute rides the
    * index — no per-hop attribute join), every scored matching node
    * folds into a second running top-beam the hop it is first seen,
    * and the answer is the exact top-k of all matching nodes the walk
    * scored. The walk runs at a 2× working beam so matching mass
    * keeps flowing under 1/|labels| selectivity. Recall is gated
    * against the FILTERED exact answer
    * ([[Similarity.knnBruteFiltered]]) — the contract a constrained
    * query actually has. */
  def graphSearchFilteredBatch(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, label: Int, beam: Int = 8,
      hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val edges = spark.read.parquet(s"$root/edges")
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val workBeam = DescentWorkFactor * beam
    require(k <= workBeam,
      s"top-k $k must fit inside the filtered working beam $workBeam")
    val eroot = stagedEntries(spark, root, queries, workBeam, s"qf$nQueries")
    graphFilteredOracleRoots = Some((Staging.abs(root), Staging.abs(eroot)))
    val entries = spark.read.parquet(eroot)
    val tr = batchBeam(edges, vecs, queries, entries, workBeam, hops,
      filterLab = Some(label))
    Similarity.topKBounded(
      tr.bestF.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")),
      k)
  }

  // ---- q164: graph serving UNDER vector delete (tombstones) ----

  /** (index root, staged-entries root, tombstone root) of the last
    * q164 run. */
  @volatile private[graft] var graphDeleteOracleRoots: Option[(String, String, String)] = None

  /** Graph-ANN serving under the logical DELETE — the graph twin of
    * q163's tombstone-anti-joined IVF probe, completing the delete op
    * across both index families: the persisted graph is untouched
    * (rewriting adjacency on the delete path would cost a rebuild —
    * the LSM economics), deleted nodes keep ROUTING (HNSW soft-delete:
    * removing them from traversal fragments the graph, the q157
    * failure mode), and the tombstone set constrains COLLECTION via
    * the same second-pool machinery as the attribute filter — a
    * retracted vector can navigate a walk but can never be served.
    * The flag rides the expand view via ONE broadcast join per serve
    * call (ids-only tombstones), so the per-hop plan is unchanged.
    * Runs at the 2× working beam (the q157 convention) so surviving
    * mass keeps flowing; the answer is the exact top-k of every
    * surviving node the walk scored. */
  def graphSearchDeleted(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val ts = AnnIndex.tombstonesStaged(spark, dir)
    val edges = spark.read.parquet(s"$root/edges")
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs
      .filter(col("vec_id") < nQueries && col("vec_id") % 10 =!= 5)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val workBeam = DescentWorkFactor * beam
    require(k <= workBeam,
      s"top-k $k must fit inside the delete working beam $workBeam")
    val eroot = stagedEntries(spark, root, queries, workBeam, s"qd$nQueries")
    graphDeleteOracleRoots =
      Some((Staging.abs(root), Staging.abs(eroot), Staging.abs(ts)))
    val entries = spark.read.parquet(eroot)
    val tr = batchBeam(edges, vecs, queries, entries, workBeam, hops,
      tombstones = Some(spark.read.parquet(s"$ts/ids")))
    Similarity.topKBounded(
      tr.bestF.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")),
      k)
  }

  // ---- q170: graph delete COMPACTION (physical erasure) ----

  /** Graph tombstone COMPACTION — physically erase the victims from
    * every table the serving path reads, completing the graph member
    * of the erasure family (q168's audit proved victim bytes remained
    * on `graph_edges_dst` and `graph_vecs` with no op to drain them —
    * the round-15 verdict's top gap): ONE partition-preserving rewrite
    * of `edges/` dropping every row whose src OR dst is tombstoned
    * (two broadcast anti-joins — victims must stop being routable AND
    * stop being reachable), of `vecs/` dropping the victim rows, a
    * fresh min-hash `entries/` sample over the SURVIVORS only (a
    * stale sample could name a victim as an entry — re-serving its
    * bytes), and a one-row `meta/` with the survivor count. No
    * NN-descent rounds run: adjacency simply loses its tombstoned
    * members (nodes whose lists shrink below K keep their surviving
    * edges — the q159 degree audit makes the erosion visible, and the
    * q125-style rebuild is the repair when it matters). Unlike
    * IVF/PQ/BM25, compaction here is NOT trajectory-equivalent to the
    * tombstoned probe (q164 keeps victims ROUTING; erasure removes
    * them from navigation — the HNSW soft-delete vs rebuild
    * distinction), so the gate is the serving contract itself: no
    * victim served, recall floor vs the survivor exact answer,
    * determinism (GraphServeSpec) plus the hash-exact SQL replay of
    * the traversal over the compacted segments. */
  def graphDeleteCompactIndexStaged(spark: SparkSession,
      dir: String): String = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val ts = AnnIndex.tombstonesStaged(spark, dir)
    val out = "target/nndescent/graft_nngdc_" + Bucketed.md5hex(
      s"$dir/delcompact/i9/k${NnDescent.K}/w${NnDescent.WorkFactor}" +
        s"/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val tsIds = spark.read.parquet(s"$ts/ids")
      spark.read.parquet(s"$root/edges")
        .join(broadcast(tsIds.select(col("vec_id").as("src"))), Seq("src"),
          "left_anti")
        .join(broadcast(tsIds.select(col("vec_id").as("dst"))), Seq("dst"),
          "left_anti")
        .repartition(col("nbucket"))
        .sortWithinPartitions("src")
        .write.mode("overwrite").partitionBy("nbucket")
        .parquet(s"$tmp/edges")
      val survivors = spark.read.parquet(s"$root/vecs")
        .join(broadcast(tsIds), Seq("vec_id"), "left_anti")
      survivors
        .repartition(col("nbucket"))
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite").partitionBy("nbucket")
        .parquet(s"$tmp/vecs")
      NnDescent.writeEntrySample(survivors, s"$tmp/entries")
      import spark.implicits._
      Seq(Tuple1(survivors.count())).toDF("n").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/meta")
    }
    out
  }

  /** (compacted root, staged-entries root) of the last q170 run. */
  @volatile private[graft] var graphCompactOracleRoots: Option[(String, String)] = None

  /** Serving over the delete-compacted graph — the same [[batchBeam]]
    * walk with NO tombstone frame anywhere in the plan: the victims'
    * bytes are gone from edges, vecs, and the entry sample (q168's
    * extended audit reads zero on all three). Runs at the q164 working
    * beam so the two delete tiers stay comparable. */
  def graphSearchDeleteCompacted(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hops: Int = 8): DataFrame = {
    val root = graphDeleteCompactIndexStaged(spark, dir)
    val edges = spark.read.parquet(s"$root/edges")
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val workBeam = DescentWorkFactor * beam
    require(k <= workBeam,
      s"top-k $k must fit inside the delete working beam $workBeam")
    val eroot = stagedEntries(spark, root, queries, workBeam, s"qdc$nQueries")
    graphCompactOracleRoots = Some((Staging.abs(root), Staging.abs(eroot)))
    val entries = spark.read.parquet(eroot)
    val tr = batchBeam(edges, vecs, queries, entries, workBeam, hops)
    Similarity.topKBounded(
      tr.best.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")),
      k)
  }

  // ---- q158: SQ8-quantized serving index (footprint) ----

  /** Stage the SQ8-QUANTIZED serving edge table next to the
    * full-precision index: each edge's embedded destination vector is
    * scalar-quantized to 8-bit codes under ONE global per-dimension
    * bounds row (the q116 quantizer), with the reconstruction norm
    * precomputed per edge. The embedded-vector payload is the
    * DOMINANT index component (K copies of every vector — the
    * locality trade the round-14 fusion bought), so the 8-byte→1-byte
    * cut is an ~4–8× footprint reduction of the whole serving
    * artifact — at 100 TB the difference between an index that fits
    * the cluster's NVMe tier and one that doesn't (the DiskANN/Faiss
    * economics: compressed vectors steer traversal, full precision
    * reranks). The fp `vecs/` table remains the source of truth.
    *
    * Maintenance: the quantized table is a DERIVED artifact — one
    * map-only encode pass over whatever serving root it shadows — so
    * after a graph append (q148/q155) the maintenance op is simply
    * re-deriving from the appended root (content-keyed staging makes
    * that automatic: a new root re-materializes, a stale one never
    * serves); the bounds row is corpus-global and append-stable for
    * in-distribution arrivals, and a drift in it shows up as a
    * reconstruction-error shift in the q159-style health signals. */
  def graphSq8IndexStaged(spark: SparkSession, dir: String): String = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val out = "target/nndescent/graft_nngq_" + Bucketed.md5hex(
      s"$dir/q4/k${NnDescent.K}/w${NnDescent.WorkFactor}/r${NnDescent.Rounds}" +
        s"/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val e = Similarity.prepared(Tables.embeddings(spark, dir))
      val bounds = Similarity.sqBounds(e)
      bounds.coalesce(1).write.mode("overwrite").parquet(s"$tmp/bounds")
      // quantize each edge's embedded destination vector — map-only
      // over the staged fp edges (the bounds frame is ONE broadcast
      // row; the crossJoin inside sqEncode is the audited one-row-
      // bounds shape), reconstruction norm precomputed so serving
      // never recomputes it per hop
      val enc = Similarity.sqEncode(
        spark.read.parquet(s"$root/edges").withColumnRenamed("d_emb", "emb"),
        bounds)
      enc
        .withColumn("d_nrm_hat", Similarity.l2norm(
          Similarity.sqDequant(col("codes"), col("mns"), col("spans"))))
        .select(col("nbucket"), col("src"), col("dst"),
          col("codes").as("d_codes"), col("d_nrm_hat"), col("d_lab"))
        .repartition(col("nbucket"))
        .sortWithinPartitions("src")
        .write.mode("overwrite").partitionBy("nbucket")
        .parquet(s"$tmp/edges")
    }
    out
  }

  /** Batched graph-ANN serving over the QUANTIZED edge table, with a
    * full-precision rerank: the walk scores dequantized
    * reconstructions (the bounds row becomes driver literals — dim-
    * bounded, no join in the serving plan at all), and the final
    * bounded pool (|Q|·beam rows) reranks against the fp `vecs/`
    * table, so quantization error steers only the TRAVERSAL, never
    * the returned scores — asymmetric distance, error enters once.
    * Same [[batchBeam]] machinery, same O(hops) jobs. */
  def graphSearchSq8Batch(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val qroot = graphSq8IndexStaged(spark, dir)
    val b = spark.read.parquet(s"$qroot/bounds").head()
    val mns = typedlit(b.getSeq[Double](b.fieldIndex("mns")))
    val spans = typedlit(b.getSeq[Double](b.fieldIndex("spans")))
    val edges = spark.read.parquet(s"$qroot/edges")
      .withColumn("d_emb", Similarity.sqDequant(col("d_codes"), mns, spans))
      .select(col("nbucket"), col("src"), col("dst"), col("d_emb"),
        col("d_nrm_hat").as("d_nrm"), col("d_lab"))
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    // the 2× working beam (round 16 — see serveBatch): the quantized
    // walk gets the same recall lift, and the fp rerank pool widens
    // with it (still |Q|·workBeam rows — bounded)
    val workBeam = DescentWorkFactor * beam
    require(k <= workBeam,
      s"top-k $k must fit inside the working beam $workBeam")
    val eroot = stagedEntries(spark, root, queries, workBeam, s"qs$nQueries")
    sq8OracleRoots = Some((Staging.abs(root), Staging.abs(qroot), Staging.abs(eroot)))
    val entries = spark.read.parquet(eroot)
    val tr = batchBeam(edges, vecs, queries, entries, workBeam, hops)
    // full-precision rerank of the bounded pool: two query/node-keyed
    // joins over |Q|·beam rows, then the exact cosine and the cut
    val exactScored = tr.best.select(col("query_id"), col("node"))
      .join(vecs.select(col("vec_id").as("node"), col("emb").as("r_emb"),
        col("nrm").as("r_nrm")), "node")
      .join(queries, "query_id")
      .select(col("query_id"), col("node").as("neighbor_id"),
        Similarity.cosine(col("q_emb"), col("q_nrm"), col("r_emb"),
          col("r_nrm")).as("score"))
    Similarity.topKBounded(exactScored, k)
  }

  /** The top level's [[TopEntries]] min-(xxhash64, id) nodes. */
  private[operators] def writeTopEntries(pool: DataFrame, path: String): Unit =
    pool
      .select(col("vec_id"),
        xxhash64(col("vec_id"), lit("nn-hier-top")).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc).limit(TopEntries)
      .select(col("vec_id").as("entry_id"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** The hierarchical descent over staged layers, shared by q152
    * (converge + telemetry), q154 (fixed budgets), and the q155
    * post-append serve: every query starts at the staged top entries,
    * each upper layer runs [[batchBeam]] at the 2× working beam
    * ([[DescentWorkFactor]] — the round-14 recall fix), the per-query
    * top of everything scored so far carries down as the next layer's
    * entries, and only the final answer cuts to k. Every
    * layer's scored nodes are real corpus nodes and compete in the
    * final top-k. Returns (result, per-layer realized iteration
    * counts in descent order — top layers first, base last; total
    * hops is their sum — and the level count). The per-layer counts
    * are what the q152 converge-mode oracle replays: a layer's
    * adaptive stop fires AFTER a no-improvement iteration whose state
    * fold cannot change `best`, so an unrolled SQL chain of exactly
    * those realized iterations reproduces the final pool bit for
    * bit. */
  private def hierServe(spark: SparkSession, hroot: String,
      baseEdges: DataFrame, vecs: DataFrame, queries: DataFrame, k: Int,
      beam: Int, upperBudget: Int, baseBudget: Int,
      converge: Boolean, filterLab: Option[Int] = None): (DataFrame, Seq[Int], Int) = {
    import spark.implicits._
    require(k <= DescentWorkFactor * beam,
      s"top-k $k must fit inside the descent working beam")
    val levels = spark.read.parquet(s"$hroot/meta")
      .select("level").collect().map(_.getInt(0)).sorted.reverse.toSeq
    val tops = spark.read.parquet(s"$hroot/top").orderBy("entry_id")
      .collect().map(_.getLong(0)).toIndexedSeq
    val workBeam = DescentWorkFactor * beam
    // every query starts at the staged top entries — a ≤ TopEntries
    // literal array exploded per query (no join at all)
    var entries = queries.select("query_id")
      .select(col("query_id"), explode(typedlit(tops)).as("node"))
      .where(col("node") =!= col("query_id"))
    var best: DataFrame = null
    var bestF: DataFrame = null
    val layerHops = Seq.newBuilder[Int]
    // EVERY layer (base included) runs at the working width; only the
    // final answer cuts to k. Cutting the frontier below the carried
    // entry count mid-descent is the r13 mid-walk-contraction mistake
    // in serving form: entries outside the cut are already marked
    // visited, so the walk can never pass THROUGH them again — the
    // measured effect was q154 recall 0.72 → 0.62 when the carry
    // widened without widening the base frontier.
    // Under a filter, the UPPER layers stay predicate-agnostic (they
    // only navigate; a matching node good enough to carry re-scores at
    // the next layer's hop 0 and enters the base layer's filtered pool
    // there) and only the BASE layer maintains the filtered collection
    // pool — the q157 design composed with the descent.
    val layerPlan =
      levels.map(l => (spark.read.parquet(s"$hroot/layer_$l"),
        upperBudget, None: Option[Int])) :+
        ((baseEdges, baseBudget, filterLab))
    layerPlan.foreach { case (edges, budget, lab) =>
      val tr = batchBeam(edges, vecs, queries, entries, workBeam,
        budget, converge, lab)
      layerHops += tr.hops
      best = tr.best
      bestF = tr.bestF
      // carry each query's best nodes seen SO FAR down a level: each
      // layer re-scores its entries at hop 0 and folds them into its
      // running top-workBeam, so the carried best after layer L is —
      // by induction — the top-workBeam of EVERYTHING scored in layers
      // <= L; no cross-layer accumulator frame is needed at all
      entries = best.select("query_id", "node").localCheckpoint(false)
    }
    val pool = if (filterLab.isDefined) bestF else best
    val result = Similarity.topKBounded(
      pool.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")),
      k)
    (result, layerHops.result(), levels.size)
  }

  /** Attribute-constrained HIERARCHICAL serving — the q157 filtered
    * collection composed with the q154 descent (the production
    * constrained query over a layered index): upper layers navigate
    * predicate-agnostically, the base layer maintains the filtered
    * pool, and the answer is the top-k of every matching node the
    * base walk scored. Spec-gated next to its flat sibling. */
  def graphSearchHierFilteredBatch(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, label: Int, beam: Int = 8,
      hopsPerLevel: Int = 2, hops: Int = 8): DataFrame = {
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val hroot = graphHierStaged(spark, dir)
    val vecs = spark.read.parquet(s"$root0/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    hierServe(spark, hroot, spark.read.parquet(s"$root0/edges"), vecs,
      queries, k, beam, upperBudget = hopsPerLevel, baseBudget = hops,
      converge = false, filterLab = Some(label))._1
  }

  /** Batched HIERARCHICAL serving (q154) — the production shape for
    * bulk query tables: the layer descent computes each query's entry
    * nodes and the batch machinery executes every step as query-keyed
    * equi-joins, so a query TABLE descends the hierarchy in
    * O(levels·hopsPerLevel + hops) jobs with no per-query driver
    * state. Upper layers have constant expected diameter, so 2 hops
    * from the carried-down working beam suffice; the base layer gets
    * the full `hops` budget. */
  def graphSearchHierBatch(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hopsPerLevel: Int = 2,
      hops: Int = 8): DataFrame = {
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val hroot = graphHierStaged(spark, dir)
    hierOracleInfo = Some((Staging.abs(root0), Staging.abs(hroot),
      spark.read.parquet(s"$hroot/meta").select("level")
        .collect().map(_.getInt(0)).sorted.reverse.toSeq))
    val vecs = spark.read.parquet(s"$root0/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    hierServe(spark, hroot, spark.read.parquet(s"$root0/edges"), vecs,
      queries, k, beam, upperBudget = hopsPerLevel, baseBudget = hops,
      converge = false)._1
  }

  /** Search trace: the ANN answer plus the measured hop/level
    * telemetry the hierarchy's log-diameter claim is audited on. */
  final case class HierTrace(result: DataFrame, hops: Int, levels: Int)

  /** Hierarchical search WITH hop telemetry (q152): each layer runs TO
    * CONVERGENCE (the adaptive stop: a hop that improves no query's
    * running top-beam ends the level) under the `maxHops` cap, through
    * the same [[hierServe]]/[[batchBeam]] machinery as q154 — one
    * traversal implementation (round 14; the driver-orchestrated twin
    * loop is gone). */
  def graphSearchHierTrace(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, maxHops: Int = 8): HierTrace = {
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val hroot = graphHierStaged(spark, dir)
    val vecs = spark.read.parquet(s"$root0/vecs")
    val queries = NnDescent.prunedByIds(vecs, "vec_id",
        (0L until nQueries.toLong).toSeq)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val (result, layerHops, levels) = hierServe(spark, hroot,
      spark.read.parquet(s"$root0/edges"), vecs, queries, k, beam,
      upperBudget = maxHops, baseBudget = maxHops, converge = true)
    // realized per-layer iteration counts → the q152 oracle replay
    // (levels in descent order, matching the staged layer list)
    hierTraceOracleInfo = Some((Staging.abs(root0), Staging.abs(hroot),
      spark.read.parquet(s"$hroot/meta").select("level")
        .collect().map(_.getInt(0)).sorted.reverse.toSeq,
      layerHops, nQueries))
    HierTrace(result, layerHops.sum, levels)
  }

  /** FLAT search under the same adaptive hops-to-converge rule as the
    * hierarchical path — layer-0 only, sample entries — so the stress
    * artifact can compare hops(flat) vs hops(hier) at 1× and 10×
    * corpus size on equal terms (the r12-verdict "hops, not just
    * time" evidence: flat hops grow with the layer-0 diameter, hier
    * hops with the level count). Not a catalog entry; the q147
    * serving contract keeps its fixed hop budget. */
  def graphSearchFlatTrace(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, maxHops: Int = 32): HierTrace = {
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val vecs = spark.read.parquet(s"$root0/vecs")
    val queries = NnDescent.prunedByIds(vecs, "vec_id",
        (0L until nQueries.toLong).toSeq)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val entries = entriesBatch(spark, queries, root0, beam)
    val tr = batchBeam(spark.read.parquet(s"$root0/edges"), vecs,
      queries, entries, beam, maxHops, converge = true)
    HierTrace(
      Similarity.topKBounded(
        tr.best.select(col("query_id"), col("node").as("neighbor_id"),
          col("score")),
        k),
      tr.hops, 0)
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q151_knn_graph_batch",
      "EXECUTOR-SIDE batched graph-ANN serving — beam search with ALL " +
        "traversal state in query-keyed DataFrames (frontier / visited " +
        "/ scores), so a query TABLE of any size is served in O(hops) " +
        "jobs with no per-query driver state; since round 14 this is " +
        "the ONE traversal implementation (q147 is its interactive-" +
        "count wrapper; the driver-orchestrated twin loop is deleted). " +
        "Per hop, ONE equi-join expands the frontier through the " +
        "persisted edge table — which EMBEDS each destination's vector " +
        "(the HNSW vectors-with-adjacency locality trade, written once " +
        "at index build), so scoring is inline and the per-hop corpus-" +
        "keyed vector join is gone (r13 verdict fusion item) — then " +
        "one collect_list aggregate (<= beam*K structs per query by " +
        "construction) plus one state join fold the proposals into " +
        "each query's constant-bounded array state — dedup, visited " +
        "drop, and beam cut are per-row array ops, ONE shuffle per hop; AQE broadcasts the query side while it is small " +
        "and co-partitions the shuffle when it is not. Entries come " +
        "from the staged per-bucket sample of REAL node ids via " +
        "xxhash64(query_id, slot). No oracle (the trajectory depends " +
        "on the learned graph); design-gated (identity with the q147 " +
        "wrapper, recall >= the IVF bar over the 100-query batch, " +
        "determinism).",
      (s, dir) => graphSearchBatchOracle(s, dir, nQueries = 100, k = 5),
      oracleFn = Some(() => graphOracleRoots.get(100).map { case (root, eroot) =>
        graphProbeSql(s"$root/edges/*/*.parquet",
          s"$root/vecs/*/*.parquet", s"$eroot/*.parquet",
          beam = DescentWorkFactor * 8, hops = 8, k = 5)
      })),

    Query(
      "q152_knn_graph_hier",
      "HNSW-style HIERARCHICAL entry points over the NN-descent graph " +
        "family — the r12-verdict fix for hop growth at corpus scale: " +
        "level l keeps the nodes with xxhash64(id) = 0 mod 8^l (nested " +
        "1/8 decimation, deterministic and id-agnostic), an NN-descent " +
        "graph is staged per level (total extra build cost <= 1/7 of " +
        "the base build), and search descends from the top level's " +
        "min-hash entries, beam-searching each level TO CONVERGENCE " +
        "(a hop that improves no query's running top-beam ends the " +
        "level) and carrying each query's best nodes down as the next " +
        "level's entries — EVERY layer at a 2x WORKING BEAM, only the " +
        "final answer cut to k (round-14: the r13 build-side working-" +
        "beam lesson applied to the descent; a serve-width funnel " +
        "measured 0.70 tracked recall, and contracting mid-descent " +
        "blocks walks through already-visited good nodes). Runs on the same batch machinery as q151/" +
        "q154 (one traversal implementation since round 14). Each " +
        "level graph has constant expected diameter, so total hops " +
        "grow with the LEVEL COUNT — logarithmic in N — while flat " +
        "search hops grow with the layer-0 diameter; STRESS_SF1 " +
        "carries the measured hops at 1x and 10x corpus. ORACLE since " +
        "round 17 (r16 verdict item 3): the run records each layer's " +
        "REALIZED iteration count, and the SQL twin unrolls exactly " +
        "that many steps per layer over the staged hierarchy — the " +
        "adaptive stop fires after a no-improvement iteration whose " +
        "fold cannot change the carried pool, so the replay is exact " +
        "(hierServe doc). Recall/hop-telemetry stay design-gated.",
      (s, dir) => graphSearchHierTrace(s, dir, nQueries = 10, k = 5).result,
      oracleFn = Some(() => hierTraceOracleInfo.map {
        case (root0, hroot, levels, layerHops, nq) =>
          hierProbeSql(levels.map(l => s"$hroot/layer_$l/*/*.parquet"),
            s"$root0/edges/*/*.parquet", s"$root0/vecs/*/*.parquet",
            s"$hroot/top/*.parquet", workBeam = DescentWorkFactor * 8,
            // realized iterations → SQL hop budget: the chain emits
            // steps 0..budget, i.e. budget+1 iterations
            upperBudgets = layerHops.dropRight(1).map(h => math.max(0, h - 1)),
            baseBudget = math.max(0, layerHops.last - 1), k = 5,
            queryPred = s"SELECT vec_id FROM embeddings WHERE vec_id < $nq")
      })),

    Query(
      "q154_knn_graph_hier_batch",
      "Batched HIERARCHICAL graph serving — the composition of q151 " +
        "and q152 and the production shape for bulk query tables: " +
        "the layer descent computes each query's entry nodes and the " +
        "batch machinery executes every step as query-keyed equi-" +
        "joins (fused expand+score through the vector-embedding edge " +
        "table / dedup / anti-join visited / tournament beam cut), so " +
        "a query TABLE descends the hierarchy in O(levels*hopsPerLevel " +
        "+ hops) jobs with no per-query driver state. Upper layers " +
        "have constant expected diameter, so 2 hops per layer at the " +
        "carried-down 2x working beam suffice; the nested-by-" +
        "divisibility levels guarantee every carried entry exists in " +
        "the next layer's graph. No oracle (learned-graph trajectory); " +
        "design-gated in GraphServeSpec (recall >= the IVF bar over " +
        "the 100-query batch, determinism, no-cartesian plan assert).",
      (s, dir) => graphSearchHierBatch(s, dir, nQueries = 100, k = 5),
      oracleFn = Some(() => hierOracleInfo.map { case (root0, hroot, levels) =>
        hierProbeSql(levels.map(l => s"$hroot/layer_$l/*/*.parquet"),
          s"$root0/edges/*/*.parquet", s"$root0/vecs/*/*.parquet",
          s"$hroot/top/*.parquet", workBeam = DescentWorkFactor * 8,
          upperBudgets = Seq.fill(levels.size)(2), baseBudget = 8, k = 5,
          queryPred = "SELECT vec_id FROM embeddings WHERE vec_id < 100")
      })),

    Query(
      "q155_knn_graph_hier_append",
      "Hierarchical-index APPEND — the maintenance op completing the " +
        "graph family's parity with IVF (q109/q124/q125): q148 " +
        "inserts arrivals into the FLAT graph, but the q152/q154 " +
        "level graphs were built once, so after any ingest the " +
        "hierarchical probes served a stale structure that neither " +
        "contained nor routed to new nodes. Level membership is a " +
        "pure hash test (xxhash64(id) = 0 mod 8^l), so each delta " +
        "node's levels are deterministic; the insert is the q148 " +
        "delta-sized batch walk applied per level (base graph at " +
        "layer 0, each base level graph inside its level population), " +
        "levels the base lacked build from scratch at their " +
        "geometrically shrinking size, and the min-hash top entries " +
        "recompute in one bounded pass. Layers stage in the serving " +
        "layout, so the q154 descent serves the appended root " +
        "unchanged — this entry runs it over a mixed base+delta " +
        "query set. No oracle (learned-graph trajectory); design-" +
        "gated in GraphServeSpec (post-append recall >= the IVF bar " +
        "with the delta subset asserted separately, staleness " +
        "differential — the base hierarchy provably holds no delta " +
        "node, determinism, idempotent staging).",
      (s, dir) => graphSearchHierAppended(s, dir, nQueries = 100, k = 5),
      oracleFn = Some(() => hierAppendOracleInfo.map { case (root0, aroot, levels) =>
        hierProbeSql(levels.map(l => s"$aroot/layer_$l/*/*.parquet"),
          s"$aroot/edges/*/*.parquet", s"$root0/vecs/*/*.parquet",
          s"$aroot/top/*.parquet", workBeam = DescentWorkFactor * 8,
          upperBudgets = Seq.fill(levels.size)(2), baseBudget = 8, k = 5,
          queryPred = "SELECT vec_id FROM embeddings WHERE vec_id < 100")
      })),

    Query(
      "q157_knn_graph_filtered",
      "Attribute-constrained GRAPH search — 'nearest neighbors WHERE " +
        "label = ?' over the persisted NN-descent index, the graph " +
        "twin of q156's partition-pruned IVF probe (the two cover " +
        "opposite selectivity regimes of every production vector " +
        "store's constrained query). The traversal stays PREDICATE-" +
        "AGNOSTIC — restricting the walk to matching nodes fragments " +
        "the graph and strands it, the known filtered-HNSW failure " +
        "mode (cf. ACORN) — while the predicate constrains COLLECTION: " +
        "the staged edge rows carry the payload attribute d_lab " +
        "(attribute rides the index; the predicate is a per-row array " +
        "test, no per-hop attribute join), each matching node folds " +
        "into a SECOND running top-beam the hop it is first scored, " +
        "and the answer is the exact top-k of every matching node the " +
        "walk scored. Runs at a 2x working beam so matching mass " +
        "keeps flowing under 1/|labels| selectivity; same O(hops) " +
        "batch jobs and constant-bounded array state as q151. No " +
        "oracle (learned-graph trajectory); design-gated in " +
        "GraphServeSpec (recall >= the IVF bar vs the FILTERED exact " +
        "answer, label-purity of every neighbor, determinism, " +
        "no-cartesian plan assert) and tracked in RECALL_LOCAL.json.",
      (s, dir) => graphSearchFilteredBatch(s, dir, nQueries = 100, k = 5,
        label = 3),
      oracleFn = Some(() => graphFilteredOracleRoots.map { case (root, eroot) =>
        graphProbeSql(s"$root/edges/*/*.parquet",
          s"$root/vecs/*/*.parquet", s"$eroot/*.parquet",
          beam = DescentWorkFactor * 8, hops = 8, k = 5,
          filterLab = Some(3))
      })),

    Query(
      "q164_knn_graph_delete",
      "Graph-ANN serving under vector DELETE — the graph twin of " +
        "q163's tombstone probe, completing the delete maintenance op " +
        "across both index families: the persisted NN-descent graph " +
        "is never rewritten on the delete path (LSM economics — a " +
        "retraction batch stages as the same ids-only tombstone " +
        "segment q163 reads), deleted nodes keep ROUTING (HNSW " +
        "soft-delete semantics: excising them from traversal " +
        "fragments the graph, the q157 failure mode), and the " +
        "tombstone set constrains COLLECTION via the q157 second-" +
        "pool machinery — a retracted vector can navigate a walk but " +
        "can never be served. The survival flag rides the expand " +
        "view via ONE broadcast join per serve call, so the per-hop " +
        "plan gains no join; runs at the 2x working beam so " +
        "surviving mass keeps flowing. Oracle: the unrolled beam-" +
        "traversal SQL with a tombstone CTE and the NOT-deleted " +
        "collection predicate, hash-exact over the staged segments.",
      (s, dir) => graphSearchDeleted(s, dir, nQueries = 100, k = 5),
      oracleFn = Some(() => graphDeleteOracleRoots.map {
        case (root, eroot, ts) =>
          graphProbeSql(s"$root/edges/*/*.parquet",
            s"$root/vecs/*/*.parquet", s"$eroot/*.parquet",
            beam = DescentWorkFactor * 8, hops = 8, k = 5,
            tombstoneGlob = Some(s"$ts/ids/*.parquet"))
      })),

    Query(
      "q170_knn_graph_delete_compact",
      "Graph delete COMPACTION — the graph member of the physical-" +
        "erasure family (q169 PQ, q171 BM25; the r15 verdict's top " +
        "gap: q168 proved victim bytes remained on graph_edges_dst " +
        "and graph_vecs with no op to drain them): one partition-" +
        "preserving rewrite drops every edge touching a victim (src " +
        "OR dst — victims stop being routable AND reachable), the " +
        "victim vector rows, and re-derives the min-hash entry sample " +
        "over SURVIVORS only (a stale sample could name a victim as " +
        "an entry). No NN-descent rounds run — adjacency just loses " +
        "its tombstoned members; the q159 degree audit makes the " +
        "erosion visible and the rebuild is the repair when it " +
        "matters. Unlike IVF/PQ/BM25, erasure is NOT trajectory-" +
        "equivalent to q164's soft delete (victims stop navigating — " +
        "the HNSW soft-delete vs rebuild distinction), so the gate is " +
        "the serving contract: no victim served, recall vs the " +
        "survivor exact answer, determinism (GraphServeSpec), q168 " +
        "reading zero on all three compacted surfaces. Oracle: the " +
        "unrolled beam-traversal SQL over the compacted segments — " +
        "no tombstone CTE anywhere — hash-exact.",
      (s, dir) => graphSearchDeleteCompacted(s, dir, nQueries = 100, k = 5),
      oracleFn = Some(() => graphCompactOracleRoots.map { case (root, eroot) =>
        graphProbeSql(s"$root/edges/*/*.parquet",
          s"$root/vecs/*/*.parquet", s"$eroot/*.parquet",
          beam = DescentWorkFactor * 8, hops = 8, k = 5)
      })),

    Query(
      "q158_knn_graph_sq8",
      "SQ8-QUANTIZED graph serving index — the footprint half of the " +
        "serving story: the embedded destination vectors are the " +
        "DOMINANT component of the staged graph index (K copies of " +
        "every vector, the round-14 locality trade), so the staged " +
        "edge table is re-materialized with 8-bit scalar-quantized " +
        "codes under one global per-dimension bounds row (the q116 " +
        "quantizer) plus a precomputed reconstruction norm — measured " +
        "multi-x smaller on disk (GraphServeSpec audits the byte " +
        "ratio), the difference between an index that fits the NVMe " +
        "tier and one that doesn't at 100 TB. Serving dequantizes " +
        "inline (the bounds row becomes driver literals; no join " +
        "added to the per-hop plan) so quantization error steers only " +
        "the TRAVERSAL, and the final bounded pool (|Q|*beam rows) " +
        "reranks against the full-precision vecs table — asymmetric " +
        "distance, error enters once, returned scores are exact (the " +
        "DiskANN compressed-walk + fp-rerank economics). No oracle " +
        "(learned-graph trajectory); design-gated in GraphServeSpec " +
        "(recall >= the IVF bar, footprint ratio, determinism, " +
        "no-cartesian plan assert) and tracked in RECALL_LOCAL.json.",
      (s, dir) => graphSearchSq8Batch(s, dir, nQueries = 100, k = 5),
      oracleFn = Some(() => sq8OracleRoots.map { case (root, qroot, eroot) =>
        sq8ProbeSql(s"$qroot/edges/*/*.parquet",
          s"$qroot/bounds/*.parquet", s"$root/vecs/*/*.parquet",
          s"$eroot/*.parquet", beam = DescentWorkFactor * 8, hops = 8,
          k = 5)
      }))
  )
}
