package graft

import java.nio.file.{Files, Paths}

/** Per-round ANN recall artifact (round-8, verdict item 3): recall@k of
  * every approximate ANN catalog entry against the q19 exact brute-force
  * baseline, as a tracked JSON number rather than only a ScalaTest
  * pass/fail — so a recall regression shows up as a DIFF in review, not
  * just a trip wire.
  *
  * Method: run each entry at `$SPARK_GRAFT_SF_DIR` (default sf0.1, the
  * bench tier), collect the (query_id, neighbor_id) pair sets (bounded:
  * nQueries × k rows per method), and report macro-averaged
  * recall@k = mean over queries of |approx ∩ brute| / |brute|. Floors
  * are asserted here too (the artifact generator itself fails on a
  * collapse), set conservatively below the spec-asserted seeds so host
  * variance can't flake the artifact — the per-round DIFF of the exact
  * numbers is the sharp signal.
  *
  * Writes `$SPARK_GRAFT_RECALL_OUT` (default `RECALL_LOCAL.json`), one
  * JSON line with loadavg telemetry like the bench artifact.
  */
object Recall {

  /** (method entry, recall floor). Floors sit ~half the measured sf0.1
    * values so host variance can't flake the artifact while a real
    * regression (parameter rollback, family/probe bug, training
    * collapse) still trips: q20 multi-probe LSH measures ~0.80, q29
    * IVF (nProbe=32, 3 Lloyd steps) ~0.7, q74 PQ (64 centroids,
    * 256-candidate re-rank) ~0.9; q77/q78 are bit-identical to q29/q74
    * by `AnnIndexSpec`, so they inherit the same floors. */
  val methods: Seq[(String, Double)] = Seq(
    "q20_knn_lsh" -> 0.4,
    "q29_knn_ivf" -> 0.4,
    "q74_knn_pq" -> 0.5,
    "q77_knn_ivf_indexed" -> 0.4,
    "q78_knn_pq_indexed" -> 0.5,
    // SQ8 barely perturbs cosine ordering (8-bit per dim, asymmetric
    // scoring): measures ~0.95+; 0.8 still catches an encode bug
    "q116_knn_sq8" -> 0.8,
    // two-stage truncated-PCA candidates + exact rerank, round-12
    // production point (explained-variance k + proportional 10% quota,
    // the round-11 verdict fix): measures 0.98 at sf0.1 — the floor is
    // the verdict's >= 0.6 shippability bar, still ~0.6x the measured
    // value and deterministic (no RNG anywhere in the chain)
    "q136_knn_pca_rerank" -> 0.6,
    // NN-descent kNN graph (r12): the spec pins >= 0.72 (the IVF bar)
    // at sf0.001; the floor here is the family convention (~half)
    "q146_knn_graph" -> 0.4,
    // beam search over the persisted graph index (r12): same family
    // bar; the spec pins >= 0.72 at sf0.001
    "q147_knn_graph_search" -> 0.4,
    // executor-side batched serving (r13): row-for-row identical to
    // q147 by GraphServeSpec, so the floor is the same family bar —
    // its 100-query batch covers the 10 brute queries
    "q151_knn_graph_batch" -> 0.4,
    // hierarchical descent (r13): adaptive hops-to-converge per level;
    // spec pins >= 0.72 at sf0.001, measured 0.94
    "q152_knn_graph_hier" -> 0.4,
    // hierarchical entries composed with the batch loop (r13): spec
    // pins >= 0.72 over the 100-query batch at sf0.001
    "q154_knn_graph_hier_batch" -> 0.4,
    // post-append hierarchical serving (r14): the q148 walk applied
    // per level + recomputed top entries; spec pins >= 0.72 on both
    // the mixed and the delta-only query sets at sf0.001
    "q155_knn_graph_hier_append" -> 0.4,
    "q158_knn_graph_sq8" -> 0.4)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "RECALL_LOCAL.json")
    val spark = GraftSession.local("graft-recall")
    val loadStart = Bench.loadavgJson()

    def pairs(name: String): Map[Long, Set[Long]] = {
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }

    val brute = pairs("q19_knn_brute")
    require(brute.nonEmpty, "q19 brute-force baseline returned no rows")
    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val perQuery = brute.map { case (q, truth) =>
        (got.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
      }
      perQuery.sum / perQuery.size
    }
    val rows = methods.map { case (name, floor) =>
      val recall = recallOf(pairs(name))
      require(recall >= floor,
        f"$name recall@k collapsed: $recall%.3f < floor $floor%.2f")
      println(f"[recall] $name%-22s recall@k = $recall%.3f (floor $floor%.2f)")
      s""""$name":{"recall":$recall,"floor":$floor}"""
    } ++ {
      // Delta-insert entries (q148 graph walk, q162 PQ frozen-codebook
      // encode): their query set is the inserted nodes (vec_id % 10 ==
      // 0, < 100) rather than the shared 0..9 convention, so their
      // exact baseline is the same brute pass restricted to those
      // queries. Floors = the family conventions (~half the spec
      // measurements on the delta nodes).
      import org.apache.spark.sql.functions.col
      val exact = graft.operators.Similarity
        .knnBrute(graft.sources.Tables.embeddings(spark, sfDir), 100, 5)
        .filter(col("query_id") % 10 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      Seq(("q148_knn_graph_append", 0.4),
          ("q162_knn_pq_append", 0.5)).map { case (name, floor) =>
        val got = pairs(name)
        val perQuery = exact.map { case (q, truth) =>
          (got.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
        }
        val recall = perQuery.sum / perQuery.size
        require(recall >= floor,
          f"$name delta recall@k collapsed: $recall%.3f < floor $floor%.2f")
        println(f"[recall] $name%-22s recall@k = $recall%.3f (floor $floor%.2f, delta-node queries)")
        s""""$name":{"recall":$recall,"floor":$floor,"queries":"delta_nodes"}"""
      }
    } ++ {
      // q156/q157 filtered ANN (r14): their ground truth is the
      // FILTERED exact answer (top-k among the label slice for
      // unconstrained queries), not the q19 unfiltered brute — the
      // contract a constrained query actually has. Floor = the family
      // convention; specs pin >= 0.72 at sf0.001.
      val exact = graft.operators.Similarity
        .knnBruteFiltered(graft.sources.Tables.embeddings(spark, sfDir),
          100, 5, label = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      Seq("q156_knn_filtered", "q157_knn_graph_filtered").map { name =>
        val floor = 0.4
        val got = pairs(name)
        val perQuery = exact.map { case (q, truth) =>
          (got.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
        }
        val recall = perQuery.sum / perQuery.size
        require(recall >= floor,
          f"$name filtered recall@k collapsed: $recall%.3f < floor $floor%.2f")
        println(f"[recall] $name%-22s recall@k = $recall%.3f (floor $floor%.2f, filtered brute)")
        s""""$name":{"recall":$recall,"floor":$floor,"baseline":"filtered_brute"}"""
      }
    } ++ {
      // q163/q164 delete serving (r15): ground truth is the exact
      // answer over the SURVIVING corpus for the surviving query set
      // (victims are vec_id % 10 == 5) — the contract a post-delete
      // query actually has. Floor = the family convention; specs pin
      // >= 0.72 at sf0.001 (graph) and anti-join==mask bit-equality
      // (IVF).
      import org.apache.spark.sql.functions.col
      val exact = graft.operators.Similarity
        .knnBrute(graft.sources.Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 10 =!= 5), 100, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // q163 serves the 0..9 survivor convention, q164 the 0..99 one:
      // score each over ITS query set (every served query must appear
      // in the baseline; a thinner-than-expected query set is itself a
      // failure)
      Seq(("q163_knn_ivf_delete", 9), ("q164_knn_graph_delete", 90))
        .map { case (name, nExpected) =>
          val floor = 0.4
          val got = pairs(name)
          require(got.size == nExpected,
            s"$name served ${got.size} queries, expected $nExpected")
          val perQuery = got.keys.toSeq.map { q =>
            val truth = exact.getOrElse(q, Set.empty)
            require(truth.nonEmpty, s"$name query $q missing from baseline")
            (got(q) & truth).size.toDouble / truth.size
          }
          val recall = perQuery.sum / perQuery.size
          require(recall >= floor,
            f"$name delete recall@k collapsed: $recall%.3f < floor $floor%.2f")
          println(f"[recall] $name%-22s recall@k = $recall%.3f (floor $floor%.2f, surviving brute)")
          s""""$name":{"recall":$recall,"floor":$floor,"baseline":"surviving_brute"}"""
        }
    }

    // Recall/latency FRONTIER (round-9, verdict item 5): the catalog
    // points above are single (recall, cost) samples; these sweep each
    // method's latency knob through 3 settings (the middle one = the
    // catalog default) so a future recall or speed move is visible as a
    // CURVE shift, not an unexplained point jump. One timed pass per
    // point, build included (the knnX entries build in-flight too);
    // timings carry the artifact's loadavg telemetry like the bench.
    import graft.operators.Similarity
    import graft.sources.Tables
    def timedPoint(ref: Map[Long, Set[Long]])(
        build: => org.apache.spark.sql.DataFrame): (Double, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val got = build.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val perQuery = ref.map { case (q, truth) =>
        (got.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
      }
      (perQuery.sum / perQuery.size, sec)
    }
    def sweep(tag: String, emb: org.apache.spark.sql.DataFrame,
        ref: Map[Long, Set[Long]]): Seq[String] = {
      // corpus size for the pca family's proportional quota points —
      // one count action per sweep (harness-side only; the catalog
      // entry reads n from the staged model instead)
      val nEmb = emb.count()
      val defs: Seq[(String, String, () => org.apache.spark.sql.DataFrame)] = Seq(
        ("lsh", "probeHamming=0", () => Similarity.knnLsh(emb, 10, 5, probeHamming = 0)),
        ("lsh", "probeHamming=1", () => Similarity.knnLsh(emb, 10, 5, probeHamming = 1)),
        ("lsh", "probeHamming=2", () => Similarity.knnLsh(emb, 10, 5, probeHamming = 2)),
        ("ivf", "nProbe=8",  () => Similarity.knnIvf(emb, 10, 5, nProbe = 8)),
        ("ivf", "nProbe=32", () => Similarity.knnIvf(emb, 10, 5, nProbe = 32)),
        ("ivf", "nProbe=64", () => Similarity.knnIvf(emb, 10, 5, nProbe = 64)),
        ("pq", "candidates=64",  () => Similarity.knnPq(emb, 10, 5, candidates = 64)),
        ("pq", "candidates=256", () => Similarity.knnPq(emb, 10, 5, candidates = 256)),
        ("pq", "candidates=512", () => Similarity.knnPq(emb, 10, 5, candidates = 512)),
        // round-12: the pca knob is now a candidate FRACTION (the
        // round-11 finding — an absolute quota's recall decays with
        // corpus growth), swept around the 10% production default;
        // the fit is the explained-variance-k production fit
        ("pca", "candFrac=0.025", () => graft.operators.Pca.knnPcaRerank(
          emb, 10, 5, nCand = graft.operators.Pca.proportionalCand(nEmb, 0.025))),
        ("pca", "candFrac=0.05", () => graft.operators.Pca.knnPcaRerank(
          emb, 10, 5, nCand = graft.operators.Pca.proportionalCand(nEmb, 0.05))),
        ("pca", "candFrac=0.10", () => graft.operators.Pca.knnPcaRerank(
          emb, 10, 5, nCand = graft.operators.Pca.proportionalCand(nEmb, 0.10))),
        // NN-descent: the knob is the WORKING-BEAM width (round-13 —
        // the binding constraint on hard geometry: at the 10x tier
        // rounds/cap moves measured 0.16->0.18 while width moved
        // 0.16->0.76->0.96; per-round cost scales with (wf*cap)^2)
        ("graph", "workFactor=1", () => graft.operators.NnDescent
          .knnGraphQueriesOf(graft.operators.NnDescent.build(emb,
            workFactor = 1), 10, 5)),
        ("graph", "workFactor=2", () => graft.operators.NnDescent
          .knnGraphQueriesOf(graft.operators.NnDescent.build(emb,
            workFactor = 2), 10, 5)),
        ("graph", "workFactor=3", () => graft.operators.NnDescent
          .knnGraphQueriesOf(graft.operators.NnDescent.build(emb,
            workFactor = 3), 10, 5)))
      defs.groupBy(_._1).toSeq.sortBy(_._1).map { case (fam, points) =>
        // one UNTIMED pass per family before its timed points: the first
        // executed point otherwise absorbs the family's one-time costs
        // (file-cache fill, codegen/JIT of its operator chain), which at
        // these corpus sizes exceed the probe-width marginal cost and
        // read as an inverted time axis (round-9's IVF nProbe=64
        // "faster" than nProbe=8)
        timedPoint(ref)(points.head._3())
        val pts = points.map { case (_, label, build) =>
          val (r, s) = timedPoint(ref)(build())
          println(f"[frontier-$tag] $fam%-4s $label%-16s recall@5 = $r%.3f  $s%6.2f s")
          s"""{"point":"$label","recall":$r,"sec":$s}"""
        }
        s""""$fam":[${pts.mkString(",")}]"""
      }
    }
    val frontier = sweep("sf0.1", Tables.embeddings(spark, sfDir), brute)

    // 10x-tier frontier (round-10, verdict item 5): at sf0.1 (2k
    // vectors) every point is fixed-overhead-dominated — wider probes
    // measured FASTER than narrow ones. The 10x stress corpus (20k
    // vectors, sign-flip families — the StressSf1 fixture) is the
    // smallest tier where probe width has a measurable marginal cost;
    // its brute baseline is recomputed on the same corpus. Runs only at
    // the default sf0.1 tier (the stress corpus derives from it).
    val frontier10 = if (sfDir.endsWith("sf0.1")) {
      val emb10 = spark.read.parquet(StressSf1.ensureStressEmbeddings(spark))
      spark.catalog.clearCache()
      val brute10 = Similarity.knnBrute(emb10, 10, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      sweep("10x", emb10, brute10)
    } else Seq.empty

    val note =
      "recall is the monotone axis of every frontier (strictly rising " +
        "with probe width per family, both tiers); the time axis at " +
        "local tiers measures the FIXED train/assign/encode stages plus " +
        "residual host noise — the probe-width marginal cost scans " +
        "nProbe/C (or candidates/N) of a corpus that is single-digit MB " +
        "even at 10x, so it only becomes the dominant term when " +
        "inverted lists exceed memory/scan bandwidth, i.e. at cluster " +
        "scale; per-family untimed warm-up removes the first-point " +
        "JIT/file-cache skew that previously inverted the axis outright. " +
        "The pca family's knob is a candidate FRACTION since round 12 " +
        "(max(50, frac*N) capped at 4096 — the round-11 fix: the old " +
        "absolute nCand=50 decayed from 0.28 recall at 2k vectors to " +
        "~0.1 at 20k), and the fit picks k by a 60% explained-variance " +
        "threshold instead of a fixed 16 of 64: near-isotropic " +
        "synthetic data is the fixed-truncation screen's worst case " +
        "(~25% variance kept, candidates ranked on noise), so the " +
        "adaptive fit widens k here while a decaying real-embedding " +
        "spectrum would get the small k and the full scan cut"
    val json =
      s"""{"metric":"ann_recall","k":5,"n_queries":${brute.size},"sf":"$sfDir",""" +
        s""""methods":${rows.mkString("{", ",", "}")},""" +
        s""""frontier":${frontier.mkString("{", ",", "}")},""" +
        (if (frontier10.nonEmpty)
          s""""frontier_10x":${frontier10.mkString("{", ",", "}")},""" else "") +
        s""""frontier_note":"$note",""" +
        s""""loadavg_start":$loadStart,"loadavg_end":${Bench.loadavgJson()}}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    println(json)
  }
}
