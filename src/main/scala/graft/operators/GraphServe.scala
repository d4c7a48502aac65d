package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Serving paths over the persisted NN-descent kNN graph
  * ([[NnDescent.graphIndexStaged]]) beyond the q147 interactive probe:
  *
  *  - [[graphSearchBatch]] (q151): the EXECUTOR-SIDE batched form of
  *    the beam search — the r12-verdict scale seam. q147's loop keeps
  *    per-query traversal state (frontier/visited/scores) on the
  *    driver, which is the right plan for interactive query counts
  *    (every corpus touch is a driver-literal-pruned point lookup) but
  *    serializes on the driver when the queries are a TABLE. The batch
  *    form keeps the SAME traversal semantics while holding all state
  *    in DataFrames keyed by query_id: per hop, ONE equi-join expands
  *    the frontier through the edge table, one anti-join drops visited
  *    nodes, one join pair scores the fresh candidates, and the q43
  *    salted tournament cuts each query's beam — so a query table of
  *    any size is served in O(hops) jobs with NO per-query driver
  *    state. GraphServeSpec pins row-for-row identity with q147 on the
  *    same inputs (both paths draw entries from the same staged sample
  *    via the same xxhash64 slots — Catalyst-evaluated on the driver,
  *    column-evaluated here).
  *
  *  - [[graphSearchHierTrace]] (q152): HNSW-style hierarchical entry
  *    points — the r12-verdict scale fix for hop count. A flat beam
  *    search's hops-to-converge grows with the graph diameter
  *    (~log N / log K but with a large constant from random entries);
  *    HNSW's answer is a layer hierarchy: level ℓ keeps the nodes with
  *    xxhash64(id) ≡ 0 (mod 8^ℓ) — an expected 1/8 decimation per
  *    level, nested by divisibility, deterministic and id-agnostic —
  *    and an NN-descent graph is built over each level (total build
  *    cost Σ N/8^ℓ·cap² ≤ 8/7 of the base build). Search descends:
  *    start at the top level's min-hash entry nodes, beam-search that
  *    level's graph TO CONVERGENCE (the adaptive stop in
  *    [[NnDescent.beamLoop]]), carry each query's best nodes down as
  *    the next level's entries. Each level's graph has constant
  *    expected diameter (N/8^ℓ nodes, degree K), so total hops grow
  *    with the LEVEL COUNT — logarithmically in N — while a flat
  *    search's grow linearly with diameter. STRESS_SF1 carries the
  *    measured hops at 1× and 10× corpus size (the r12-verdict "hops,
  *    not just time" evidence).
  *
  * Both paths are design-gated (no oracle — the trajectory depends on
  * the learned graph): GraphServeSpec asserts batch==interactive
  * identity, the recall bar (≥ 0.72, the IVF criterion), determinism,
  * and hop telemetry sanity.
  */
object GraphServe {

  // ---- q151: executor-side batched beam search ----

  /** Batched graph-ANN serving for the query set `vec_id < nQueries`
    * (the shared ANN convention) — see the object doc. Semantics are
    * exactly [[NnDescent.graphSearchStaged]]'s: hop 0 scores the entry
    * nodes, each later hop expands the previous hop's per-query
    * top-`beam`, visited nodes are never re-scored, and the answer is
    * the top-`k` of everything scored. */
  def graphSearchBatch(spark: SparkSession, dir: String, nQueries: Int,
      k: Int, beam: Int = 8, hops: Int = 8): DataFrame = {
    val root = NnDescent.graphIndexStaged(spark, dir)
    val edges = spark.read.parquet(s"$root/edges").select("src", "dst")
    val vecs = spark.read.parquet(s"$root/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    serveBatch(spark, edges, vecs, queries, root, k, beam, hops)
  }

  /** The distributed beam loop over an arbitrary query table. State
    * lives in three query-keyed frames — frontier (≤ |Q|·beam),
    * visited (≤ |Q|·(1 + beam + hops·beam·K)), accumulated scores —
    * each `localCheckpoint`ed per hop (the q114/q146 lineage rule).
    * Every corpus-sized touch is an equi-join against the persisted
    * edge/vector tables; AQE broadcasts the query side when it is
    * small, and shuffles co-partition both sides when it is not — the
    * same plan a 1000-executor deployment wants. */
  private def serveBatch(spark: SparkSession, edges: DataFrame,
      vecs: DataFrame, queries: DataFrame, root: String, k: Int,
      beam: Int, hops: Int): DataFrame = {
    import spark.implicits._
    // the staged entry sample: ≤ NodeBuckets rows — an INDEX-scale
    // constant (not query-scale), so the driver read is bounded
    val entryIds = NnDescent.readEntrySample(spark, root)
    val entryDf = broadcast(entryIds.zipWithIndex
      .map { case (id, i) => (i.toLong, id) }.toDF("slot", "entry_id"))
    // entry slots: the SAME xxhash64(query_id, j, 'gs-entry') the
    // driver path evaluates on literals — identical entries by
    // construction
    val entries = queries.select("query_id")
      .select(col("query_id"), explode(sequence(lit(1), lit(beam))).as("j"))
      .select(col("query_id"),
        pmod(xxhash64(col("query_id"), col("j"), lit("gs-entry")),
          lit(entryIds.length.toLong)).as("slot"))
      .join(entryDf, "slot")
      .where(col("entry_id") =!= col("query_id"))
      .select(col("query_id"), col("entry_id").as("node"))
      .distinct()
    val acc = batchBeam(edges, vecs, queries, entries, beam, hops)
    Similarity.topK(
      acc.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")),
      k)
  }

  /** The distributed beam loop body over ONE edge table: expand /
    * anti-join visited / score / tournament-cut per hop, all state in
    * query-keyed frames. Returns every (query_id, node, score) the
    * traversal scored — callers cut to top-k or carry a per-query
    * top-beam into the next layer (the q154 descent). */
  private def batchBeam(edges: DataFrame, vecs: DataFrame,
      queries: DataFrame, entries: DataFrame, beam: Int,
      hops: Int): DataFrame = {
    var frontier = entries.localCheckpoint(false)
    var visited = queries
      .select(col("query_id"), col("query_id").as("node"))
      .localCheckpoint(false)
    var acc: DataFrame = null
    var hop = 0
    while (hop <= hops) {
      val cand =
        if (hop == 0) frontier
        else frontier
          .join(edges.select(col("src").as("node"), col("dst")), "node")
          .select(col("query_id"), col("dst").as("node"))
          .distinct()
      val fresh = cand.join(visited, Seq("query_id", "node"), "left_anti")
      val scored = fresh
        .join(vecs.select(col("vec_id").as("node"), col("emb"), col("nrm")),
          "node")
        .join(queries, "query_id")
        .select(col("query_id"), col("node"),
          Similarity.cosine(col("q_emb"), col("q_nrm"), col("emb"),
            col("nrm")).as("score"))
        .localCheckpoint(false)
      acc = if (acc == null) scored else acc.unionByName(scored)
      // ONLY `scored` is checkpointed (it closes the per-hop cycle);
      // visited and frontier are shallow derivations over already-
      // checkpointed frames (a union chain of LogicalRDDs / one
      // tournament), and checkpointing them too tripled the per-hop
      // job count for no lineage benefit — measured ~22 s of pure
      // scheduling floor on the hierarchical path at the local tier
      visited = visited.unionByName(scored.select("query_id", "node"))
      // next frontier: this hop's per-query top-beam (the q43 salted
      // tournament — never a bare corpus-wide window)
      frontier = Skew.groupTopK(scored, col("query_id"),
          Seq(col("score").desc, col("node").asc),
          Seq(col("score"), col("node")), n = beam, nSalts = 8)
        .select("query_id", "node")
      hop += 1
    }
    acc
  }

  /** Batched HIERARCHICAL serving (q154) — the composition of the two
    * r13 paths, and the production shape for bulk query tables: the
    * q152 layer descent computes each query's entry nodes and the
    * q151 machinery executes every step as query-keyed equi-joins, so
    * a query TABLE descends the hierarchy in O(levels·hopsPerLevel +
    * hops) jobs with no per-query driver state. Per layer, a short
    * fixed hop budget (upper layers have constant expected diameter,
    * so 2 hops from the carried-down beam suffice) and the per-query
    * top-beam of everything scored so far carries down as the next
    * layer's entries; the base layer gets the full `hops` budget.
    * Every layer's scored nodes are real corpus nodes and compete in
    * the final top-k. */
  def graphSearchHierBatch(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, hopsPerLevel: Int = 2,
      hops: Int = 8): DataFrame = {
    import spark.implicits._
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val hroot = graphHierStaged(spark, dir)
    val vecs = spark.read.parquet(s"$root0/vecs")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val levels = spark.read.parquet(s"$hroot/meta")
      .select("level").collect().map(_.getInt(0)).sorted.reverse.toSeq
    val tops = spark.read.parquet(s"$hroot/top").orderBy("entry_id")
      .collect().map(_.getLong(0)).toIndexedSeq
    // every query starts at the staged top entries — a ≤ TopEntries
    // literal array exploded per query (no join at all)
    var entries = queries.select("query_id")
      .select(col("query_id"), explode(typedlit(tops)).as("node"))
      .where(col("node") =!= col("query_id"))
    var acc: DataFrame = null
    val layerPaths = levels.map(l => s"$hroot/layer_$l" -> hopsPerLevel) :+
      (s"$root0/edges" -> hops)
    layerPaths.foreach { case (path, budget) =>
      // checkpoint each layer's scores before the cross-layer union:
      // consecutive layers reuse the queries/entries lineage, and a
      // Union whose branches share attribute ids trips Catalyst's
      // constraint rewrite; the checkpoint gives each branch fresh
      // attributes (and truncates the per-hop union chain anyway)
      val scored = batchBeam(spark.read.parquet(path), vecs, queries,
        entries, beam, budget).localCheckpoint(false)
      acc = if (acc == null) scored else acc.unionByName(scored)
      // carry the per-query best nodes seen SO FAR down a level
      entries = Skew.groupTopK(acc, col("query_id"),
          Seq(col("score").desc, col("node").asc),
          Seq(col("score"), col("node")), n = beam, nSalts = 8)
        .select("query_id", "node")
        .localCheckpoint(false)
    }
    Similarity.topK(
      acc.select(col("query_id"), col("node").as("neighbor_id"),
        col("score")).distinct(),
      k)
  }

  // ---- q152: hierarchical (HNSW-style) entry points ----

  /** Expected decimation per level: level ℓ keeps ids with
    * xxhash64(id, 'nn-hier') ≡ 0 (mod 8^ℓ) — nested by divisibility. */
  val HierDecimation = 8

  /** Smallest population a level may hold (NN-descent needs > K nodes
    * and a few dozen make the level graph meaningful). */
  val MinLevelNodes = 24

  /** How many min-hash top-level nodes seed every query's descent. */
  val TopEntries = 4

  private def pow(b: Int, e: Int): Long = (1 to e).foldLeft(1L)((a, _) => a * b)

  private def levelMember(l: Int) =
    pmod(xxhash64(col("vec_id"), lit("nn-hier")), lit(pow(HierDecimation, l))) === 0

  /** Write-once content-keyed layer hierarchy next to the base graph
    * index: `layer_ℓ/` NN-descent graphs over each decimated level
    * (same nbucket layout as the base, so the pruned point lookups
    * serve every layer), `top/` the top level's [[TopEntries]] min-hash
    * entry nodes, `meta/` the (level, n) table. Total extra build cost
    * is Σ (N/8^ℓ)·cap² ≤ N·cap²/7 — a seventh of one base round. */
  def graphHierStaged(spark: SparkSession, dir: String): String = {
    val out = "target/nndescent/graft_nnh_" + Bucketed.md5hex(
      s"$dir/h2/k${NnDescent.K}/w${NnDescent.WorkFactor}/d$HierDecimation/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val emb = Tables.embeddings(spark, dir)
      val e = Similarity.prepared(emb)
      // per-level populations in ONE aggregate pass (probe depth 8 ≫
      // any real level count: level 8 would need 8^8 ≈ 16M-fold data)
      val maxProbe = 8
      val cntRow = e.select((1 to maxProbe).map(l =>
        sum(when(levelMember(l), 1L).otherwise(0L)).as(s"c$l")): _*).head()
      val counts = (1 to maxProbe).map(l => cntRow.getLong(l - 1))
      val levels = (1 to maxProbe).takeWhile(l => counts(l - 1) >= MinLevelNodes)
      val topLevel = levels.lastOption.getOrElse(0)
      levels.foreach { l =>
        NnDescent.build(emb.filter(levelMember(l)), k = NnDescent.K,
            nKnown = counts(l - 1))
          .withColumn("nbucket", pmod(col("src"), lit(NnDescent.NodeBuckets)))
          .repartition(col("nbucket"))
          .sortWithinPartitions("src")
          .write.mode("overwrite").partitionBy("nbucket")
          .parquet(s"$tmp/layer_$l")
      }
      // descent entries: the top level's min-(hash, id) nodes — REAL
      // ids only (the q151/q147 entry discipline); when no level
      // clears MinLevelNodes the corpus itself is the top level
      val topPool = if (topLevel == 0) e else e.filter(levelMember(topLevel))
      topPool
        .select(col("vec_id"),
          xxhash64(col("vec_id"), lit("nn-hier-top")).as("h"))
        .orderBy(col("h").asc, col("vec_id").asc).limit(TopEntries)
        .select(col("vec_id").as("entry_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/top")
      import spark.implicits._
      levels.map(l => (l, counts(l - 1))).toDF("level", "n")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
    }
    out
  }

  /** Search trace: the ANN answer plus the measured hop/level
    * telemetry the hierarchy's log-diameter claim is audited on. */
  final case class HierTrace(result: DataFrame, hops: Int, levels: Int)

  /** Hierarchical beam search — descend the staged layers, running
    * each level's beam loop TO CONVERGENCE (the adaptive stop: a hop
    * that improves no query's running top-beam ends the level) and
    * carrying each query's best nodes down as the next level's
    * entries; the final level is the full base graph. Every layer's
    * scored nodes are real corpus nodes, so they all compete in the
    * final top-k. */
  def graphSearchHierTrace(spark: SparkSession, dir: String,
      nQueries: Int, k: Int, beam: Int = 8, maxHops: Int = 8): HierTrace = {
    val root0 = NnDescent.graphIndexStaged(spark, dir)
    val hroot = graphHierStaged(spark, dir)
    val vecs = spark.read.parquet(s"$root0/vecs")
    val qIds = (0L until nQueries.toLong).toSeq
    val qVecs = NnDescent.prunedByIds(vecs, "vec_id", qIds)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val levels = spark.read.parquet(s"$hroot/meta")
      .select("level").collect().map(_.getInt(0)).sorted.reverse.toSeq
    val tops = spark.read.parquet(s"$hroot/top").orderBy("entry_id")
      .collect().map(_.getLong(0)).toIndexedSeq

    var entries: Map[Long, Seq[Long]] =
      qIds.map(q => q -> tops.filter(_ != q).take(beam).toSeq).toMap
    var totalHops = 0
    val acc = Seq.newBuilder[(Long, Long, Double)]
    val layerPaths = levels.map(l => s"$hroot/layer_$l") :+ s"$root0/edges"
    layerPaths.foreach { path =>
      val tr = NnDescent.beamLoop(spark, spark.read.parquet(path), vecs,
        qVecs, entries, beam, maxHops, converge = true)
      totalHops += tr.hops
      acc ++= tr.scored
      val better = tr.scored.groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(r => (-r._3, r._2)).take(beam).map(_._2)
      }
      entries = entries.map { case (q, old) => q -> better.getOrElse(q, old) }
    }
    import spark.implicits._
    HierTrace(
      Similarity.topK(
        acc.result().distinct.toDF("query_id", "neighbor_id", "score"), k),
      totalHops, levels.size)
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
    val qIds = (0L until nQueries.toLong).toSeq
    val qVecs = NnDescent.prunedByIds(vecs, "vec_id", qIds)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val entryIds = NnDescent.readEntrySample(spark, root0)
    val entries = qIds.map(q => q -> NnDescent.entriesFor(entryIds, q, beam)).toMap
    val tr = NnDescent.beamLoop(spark, spark.read.parquet(s"$root0/edges"),
      vecs, qVecs, entries, beam, maxHops, converge = true)
    import spark.implicits._
    HierTrace(
      Similarity.topK(
        tr.scored.distinct.toDF("query_id", "neighbor_id", "score"), k),
      tr.hops, 0)
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q151_knn_graph_batch",
      "EXECUTOR-SIDE batched graph-ANN serving — the q147 beam search " +
        "re-expressed with ALL traversal state in query-keyed " +
        "DataFrames (frontier / visited / scores), so a query TABLE of " +
        "any size is served in O(hops) jobs with no per-query driver " +
        "state (the r12-verdict scale seam in the driver-orchestrated " +
        "path): per hop, one equi-join expands the frontier through " +
        "the persisted edge table, one anti-join drops visited nodes, " +
        "one join pair exact-cosine-scores the fresh candidates, and " +
        "the q43 salted tournament cuts each query's beam; AQE " +
        "broadcasts the query side while it is small and co-partitions " +
        "the shuffle when it is not. Entries come from the staged " +
        "per-bucket sample of REAL node ids via the same " +
        "xxhash64(query_id, slot) the interactive path evaluates on " +
        "literals — so both paths pick identical entries by " +
        "construction, and GraphServeSpec pins row-for-row output " +
        "IDENTITY with q147 on the same inputs. No oracle (the " +
        "trajectory depends on the learned graph); design-gated " +
        "(identity with q147, recall >= the IVF bar over the 100-query " +
        "batch, determinism).",
      (s, dir) => graphSearchBatch(s, dir, nQueries = 100, k = 5)),

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
        "level's entries. Each level graph has constant expected " +
        "diameter, so total hops grow with the LEVEL COUNT — " +
        "logarithmic in N — while flat search hops grow with the " +
        "layer-0 diameter; STRESS_SF1 carries the measured hops at 1x " +
        "and 10x corpus (the verdict's hops-not-time evidence). No " +
        "oracle; design-gated (recall >= the IVF bar, determinism, " +
        "hop telemetry <= levels*maxHops, layered-vs-flat hop audit).",
      (s, dir) => graphSearchHierTrace(s, dir, nQueries = 10, k = 5).result),

    Query(
      "q154_knn_graph_hier_batch",
      "Batched HIERARCHICAL graph serving — the composition of q151 " +
        "and q152 and the production shape for bulk query tables: " +
        "the layer descent computes each query's entry nodes and the " +
        "batch machinery executes every step as query-keyed equi-" +
        "joins (expand / anti-join visited / score / tournament beam " +
        "cut), so a query TABLE descends the hierarchy in " +
        "O(levels*hopsPerLevel + hops) jobs with no per-query driver " +
        "state. Upper layers have constant expected diameter, so 2 " +
        "hops per layer from the carried-down beam suffice; the " +
        "nested-by-divisibility levels guarantee every carried entry " +
        "exists in the next layer's graph. No oracle (learned-graph " +
        "trajectory); design-gated in GraphServeSpec (recall >= the " +
        "IVF bar over the 100-query batch, determinism, no-cartesian " +
        "plan assert).",
      (s, dir) => graphSearchHierBatch(s, dir, nQueries = 100, k = 5))
  )
}
