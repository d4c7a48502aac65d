package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Distributed kNN-GRAPH construction by NN-descent (Dong, Moses &
  * Li, WWW 2011) — the graph family that underlies production
  * graph-ANN serving (HNSW-shaped indexes) and kNN-graph consumers
  * (SemDeDup pairing, label propagation, manifold methods). The
  * insight: "a neighbor of a neighbor is likely a neighbor" — start
  * from an arbitrary K-neighbor graph and repeatedly let each node
  * propose its neighbors to each other, keeping the best K per node;
  * empirically converges in a handful of rounds at ~O(N^1.14) scored
  * pairs total, without ever forming the N² pair space.
  *
  * Spark shape (the q114/q40 bounded-iteration pattern):
  *   - STATE: an edge frame (src, dst, score) with ≤ K rows per src —
  *     node-keyed, partitioned by src through every round.
  *   - INIT: K pseudo-random neighbors per node from `xxhash64(src,
  *     round-salt) mod N` — deterministic by construction (the SRP
  *     seeding rule), no RNG state to ship.
  *   - ROUND: symmetrize (union reversed edges), CAP each node's
  *     adjacency at [[Cap]] by hash order (the published sampling-ρ
  *     trick — bounds the per-node join fan-out), self-join on the
  *     CENTER node so each adjacency list proposes its member PAIRS,
  *     dedup, score by exact cosine (two node-keyed equi-joins to
  *     attach vectors — never a cross join), union both directions
  *     with the current edges, keep top-K per src on (score DESC,
  *     dst ASC). Per-round work is ≤ N·Cap² candidate scores — LINEAR
  *     in N with a constant factor, the published economics.
  *   - TERMINATION: fixed [[Rounds]] (the q114 convention — a
  *     convergence test would add a count action per round for no
  *     plan benefit at these diameters); `localCheckpoint` truncates
  *     lineage each round.
  *
  * The per-node top-K uses a `Window.partitionBy(src)` — bounded by
  * construction: its input carries ≤ K + Cap²/2 + Cap rows per src
  * (current edges + proposals), never a corpus-wide partition.
  *
  * No oracle (the fixed point depends on the init graph; not SQL).
  * NnDescentSpec gates: recall@5 vs q19 exact ≥ the IVF family's at
  * comparable candidate volume (the r11 verdict bar), round-over-
  * round mean-score monotonicity (the NN-descent invariant), build
  * determinism, no-cartesian plan assert, and a planted-clusters
  * fixture where the graph must recover every true neighborhood.
  */
object NnDescent {

  /** Graph degree (neighbors kept per node). */
  val K = 10

  /** NN-descent refinement rounds after init. */
  val Rounds = 3

  /** Per-node adjacency cap before pair proposal (the sampling ρ). */
  val Cap = 20

  private def scorePairs(cands: DataFrame, e: DataFrame): DataFrame =
    cands
      .join(e.select(col("vec_id").as("src"), col("emb").as("s_emb"),
        col("nrm").as("s_nrm")), "src")
      .join(e.select(col("vec_id").as("dst"), col("emb").as("d_emb"),
        col("nrm").as("d_nrm")), "dst")
      .select(col("src"), col("dst"),
        Similarity.cosine(col("s_emb"), col("s_nrm"), col("d_emb"),
          col("d_nrm")).as("score"))

  /** Per-src top-k on (score DESC, dst ASC). The partition is bounded
    * by the round's per-node proposal count (≤ K + Cap + Cap²/2), so
    * the window never sees a corpus-sized group. */
  private def topKPerSrc(edges: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src")
      .orderBy(col("score").desc, col("dst").asc)
    edges.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** Build the K-NN graph over `emb`: (src, dst, score), ≤ k rows per
    * src, exact-cosine scored. `n` is the corpus size (callers that
    * already know it avoid the count action). */
  def build(emb: DataFrame, k: Int = K, rounds: Int = Rounds,
      cap: Int = Cap, nKnown: Long = -1L): DataFrame = {
    val e = Similarity.prepared(emb)
    val n = if (nKnown > 0) nKnown else e.count()
    require(n > k, s"kNN graph needs more than k=$k vectors, got $n")

    // deterministic pseudo-random init: j-th proposal for src is
    // hash(src, j) mod n, self-loops dropped (a node may start with
    // < k neighbors — NN-descent repairs that in round 1)
    val init = e.select(col("vec_id").as("src"))
      .select(col("src"), explode(sequence(lit(1), lit(k))).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j"), lit("nn-init")), lit(n))
          .as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    var edges = topKPerSrc(scorePairs(init, e), k).localCheckpoint(false)

    var r = 0
    while (r < rounds) {
      val undirected = edges.select("src", "dst")
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      // cap adjacency by hash order — deterministic sample, and it
      // bounds the self-join fan-out at cap² pairs per node
      val capW = Window.partitionBy("src")
        .orderBy(xxhash64(col("src"), col("dst"), lit(r)).asc, col("dst").asc)
      val adj = undirected.withColumn("rk", row_number().over(capW))
        .filter(col("rk") <= cap)
        .select(col("src").as("ctr"), col("dst").as("m"))
      val proposals = adj.as("a").join(adj.as("b"), "ctr")
        .where(col("a.m") < col("b.m"))
        .select(col("a.m").as("src"), col("b.m").as("dst"))
        .distinct()
      val scored = scorePairs(proposals, e)
      val both = scored.unionByName(
        scored.select(col("dst").as("src"), col("src").as("dst"),
          col("score")))
      edges = topKPerSrc(
          edges.unionByName(both)
            .groupBy("src", "dst").agg(max("score").as("score")),
          k)
        .localCheckpoint(false)
      r += 1
    }
    edges
  }

  /** ANN-query view of the graph: the query nodes' top-k neighbors in
    * the canonical (query_id, neighbor_id, rank, score) emit form. */
  def knnGraphQueries(emb: DataFrame, nQueries: Int, k: Int,
      graphK: Int = K, rounds: Int = Rounds): DataFrame = {
    val g = build(emb, graphK, rounds)
    Similarity.topK(
      g.filter(col("src") < nQueries)
        .select(col("src").as("query_id"), col("dst").as("neighbor_id"),
          col("score")),
      k)
  }

  /** Mean edge score of a graph — the monotone NN-descent progress
    * measure (micro-units, integer emit). */
  def meanScoreMicro(edges: DataFrame): Long =
    edges.agg(floor(avg("score") * 1e6d).cast("long")).head().getLong(0)

  val queries: Seq[Query] = Seq(
    Query(
      "q146_knn_graph",
      "Distributed kNN-graph construction by NN-descent (Dong et al. " +
        "2011) — the graph-ANN family (HNSW-shaped serving, SemDeDup " +
        "pairing, label propagation all consume it): start from a " +
        "deterministic hash-seeded K-neighbor graph, then a few " +
        "rounds of neighbor-proposes-neighbors — symmetrize, cap " +
        "each adjacency (the sampling trick that bounds fan-out), " +
        "self-join on the CENTER node, exact-cosine score the " +
        "proposed pairs (two node-keyed equi-joins, never a cross " +
        "join), keep top-K per node. Per-round cost is N*cap^2 " +
        "scored pairs - linear in N, the published economics; state " +
        "is node-keyed with localCheckpoint truncation (the q114 " +
        "pattern). Output: the 10 query nodes' graph neighbors in " +
        "the canonical ANN emit form. No oracle (the fixed point " +
        "depends on the init graph); design-gated in NnDescentSpec " +
        "(recall >= the IVF bar, monotone convergence, determinism, " +
        "no-cartesian plan assert, planted-cluster recovery).",
      (s, dir) => knnGraphQueries(Tables.embeddings(s, dir),
        nQueries = 10, k = 5))
  )
}
