package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphServe, NnDescent, Similarity}
import graft.sources.Tables

/** q151/q152 — serving paths over the persisted NN-descent graph.
  * No oracle (the trajectory depends on the learned graph), so the
  * gates are structural: the batch path must be ROW-FOR-ROW identical
  * to the driver-orchestrated q147 on the same inputs (same staged
  * index, same entry hash — the whole point of the re-expression is
  * changing the execution shape, not the answer), both new paths must
  * clear the family recall bar (≥ 0.72, the IVF criterion), repeats
  * must be deterministic, and the hierarchy's hop telemetry must stay
  * within its levels·maxHops budget. */
class GraphServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallVsBrute(nQ: Int,
      got: Map[Long, Set[Long]]): Double = {
    val exact = pairsOf(Similarity.knnBrute(Tables.embeddings(spark, sf), nQ, 5))
    exact.keys.toSeq
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / (exact.size * 5)
  }

  test("q151 batch serving is row-for-row identical to the q147 " +
    "driver-orchestrated search on the same inputs") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq
    val interactive = rows(
      NnDescent.graphSearchStaged(spark, sf, nQueries = 10, k = 5))
    val batch = rows(
      GraphServe.graphSearchBatch(spark, sf, nQueries = 10, k = 5))
    assert(batch === interactive,
      "the batch re-expression changed the answer — the execution " +
        "shape moved but the traversal semantics must not")
  }

  test("q151 recall over the 100-query batch clears the IVF bar and " +
    "repeats are deterministic") {
    def run() = SparkEntry.queries("q151_knn_graph_batch")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "batch serving must be deterministic")
    val recall = recallVsBrute(100,
      first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    info(s"q151 batch recall@5 over 100 queries = $recall")
    assert(recall >= 0.72d, s"recall@5 $recall below the IVF bar")
  }

  test("q151 plan holds no cartesian/nested-loop join and no bare " +
    "query window below the tournament") {
    val plan = GraphServe.graphSearchBatch(spark, sf, nQueries = 10, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q152 hierarchical search: recall clears the IVF bar, repeats " +
    "are deterministic, and hop telemetry stays within budget") {
    val tr = GraphServe.graphSearchHierTrace(spark, sf, nQueries = 10,
      k = 5, beam = 8, maxHops = 8)
    val got = pairsOf(tr.result)
    val recall = recallVsBrute(10, got)
    info(s"q152 hier recall@5 = $recall  hops = ${tr.hops}  " +
      s"levels = ${tr.levels}")
    assert(recall >= 0.72d, s"recall@5 $recall below the IVF bar")
    // the sf0.001 corpus (500 nodes, 1/8 decimation, min 24 nodes)
    // must yield exactly one upper level
    assert(tr.levels === 1, s"expected 1 upper level at 500 nodes")
    // hop budget: each of (levels + base) loops is capped at maxHops+1
    assert(tr.hops <= (tr.levels + 1) * 9,
      s"hops ${tr.hops} exceeded the descent budget")
    // determinism
    val again = GraphServe.graphSearchHierTrace(spark, sf, 10, 5, 8, 8)
    assert(again.hops === tr.hops)
    assert(pairsOf(again.result) === got)
  }

  test("q154 hierarchical batch serving: recall clears the IVF bar " +
    "over the 100-query batch, repeats are deterministic, and the " +
    "plan holds no cartesian join") {
    def run() = SparkEntry.queries("q154_knn_graph_hier_batch")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "hier batch serving must be deterministic")
    val recall = recallVsBrute(100,
      first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    info(s"q154 hier-batch recall@5 over 100 queries = $recall")
    assert(recall >= 0.72d, s"recall@5 $recall below the IVF bar")
    val plan = GraphServe.graphSearchHierBatch(spark, sf, 10, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q147 entries are real node ids drawn from the staged sample " +
    "(the id-agnostic r12-advice fix) — every entry exists even on an " +
    "offset-id corpus") {
    import spark.implicits._
    // an offset-id corpus: ids 1_000_000.., the shape that broke the
    // old floorMod(hash, n) rule (~90% of probes named nonexistent ids)
    val dim = 8
    val emb = (0 until 64).map { i =>
      (1_000_000L + i * 7L,
        Seq.tabulate(dim)(d => if (d == i % dim) 1.0f else 0.01f * i))
    }.toDF("vec_id", "embedding")
    val e = Similarity.prepared(emb)
    val ids = e.select("vec_id").collect().map(_.getLong(0)).toSet
    // the entry SAMPLE rule: min-(xxhash64, id) per id-mod bucket —
    // recompute it the staged writer's way and check membership
    val sample = e
      .select(col("vec_id"),
        pmod(col("vec_id"), lit(NnDescent.NodeBuckets)).as("ebucket"),
        xxhash64(col("vec_id"), lit("gs-entry-sample")).as("eh"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("ebucket")
          .orderBy(col("eh").asc, col("vec_id").asc)))
      .filter(col("rk") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toIndexedSeq
    assert(sample.nonEmpty)
    sample.foreach(id => assert(ids.contains(id)))
    // entriesFor only ever returns sample members
    val picked = NnDescent.entriesFor(sample, q = 42L, beam = 8)
    assert(picked.nonEmpty)
    picked.foreach(id => assert(ids.contains(id),
      s"entry $id is not a real node id"))
  }

  test("q155 hierarchical append: delta nodes enter every level they " +
    "hash into, the stale base hierarchy provably misses them, " +
    "recall clears the bar (delta subset included), and staging is " +
    "idempotent + deterministic") {
    import spark.implicits._
    val aroot = GraphServe.graphHierAppendStaged(spark, sf)
    // idempotent staging: a second call serves the same committed root
    assert(GraphServe.graphHierAppendStaged(spark, sf) === aroot)
    val broot = GraphServe.graphHierBaseStaged(spark, sf)
    val deltaIds = graft.operators.Similarity
      .prepared(Tables.embeddings(spark, sf))
      .filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect().toSet
    assert(deltaIds.nonEmpty)
    def srcs(path: String): Set[Long] =
      spark.read.parquet(path).select("src").distinct()
        .as[Long].collect().toSet
    // staleness differential: NO table the stale search reads holds a
    // delta node, so a pre-append probe provably cannot return one
    val baseLevels = spark.read.parquet(s"$broot/meta")
      .select("level").as[Int].collect().toSeq
    baseLevels.foreach { l =>
      assert((srcs(s"$broot/layer_$l") & deltaIds).isEmpty,
        s"stale base level $l contains delta nodes")
    }
    // the appended hierarchy contains every delta node at layer 0 and
    // at every level its hash admits it to
    assert(deltaIds.subsetOf(srcs(s"$aroot/edges")),
      "appended layer 0 is missing delta nodes")
    val apLevels = spark.read.parquet(s"$aroot/meta")
      .select("level").as[Int].collect().toSeq
    apLevels.foreach { l =>
      val owed = Tables.embeddings(spark, sf)
        .filter(GraphServe.levelMember(l) && col("vec_id") % 10 === 0)
        .select("vec_id").as[Long].collect().toSet
      assert(owed.subsetOf(srcs(s"$aroot/layer_$l")),
        s"appended level $l is missing delta members: " +
          s"${(owed -- srcs(s"$aroot/layer_$l")).take(5)}")
    }
    // post-append serving: recall over the mixed 100-query set and
    // over the delta subset both clear the family bar; deterministic
    def run() = SparkEntry.queries("q155_knn_graph_hier_append")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "post-append hier serving must be deterministic")
    val got = first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairsOf(Similarity.knnBrute(Tables.embeddings(spark, sf), 100, 5))
    def recallOver(qs: Iterable[Long]): Double =
      qs.map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
        .toDouble / (qs.size * 5)
    val all = recallOver(exact.keys.toSeq)
    val delta = recallOver(exact.keys.filter(_ % 10 == 0).toSeq)
    info(s"q155 post-append recall@5: all=$all delta=$delta")
    assert(all >= 0.72d, s"post-append recall $all below the IVF bar")
    assert(delta >= 0.72d, s"delta-query recall $delta below the IVF bar")
  }

  test("q157 filtered graph search: recall clears the IVF bar vs the " +
    "FILTERED exact answer, every neighbor carries the constraint " +
    "label, the walk stays predicate-agnostic, repeats are " +
    "deterministic, and the plan holds no cartesian join") {
    val label = 3
    val emb = Tables.embeddings(spark, sf)
    val exact = pairsOf(Similarity.knnBruteFiltered(emb, 100, 5, label))
    def run() = SparkEntry.queries("q157_knn_graph_filtered")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "filtered graph search must be deterministic")
    val got = first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // constraint correctness: no neighbor outside the label slice
    val labelIds = emb.filter(col("label") === label)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.values.flatten.foreach(n => assert(labelIds.contains(n),
      s"neighbor $n does not carry label $label"))
    // recall vs the FILTERED ground truth — the contract a constrained
    // query actually has (q156's criterion, graph form)
    val recall = exact.keys.toSeq
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / exact.values.map(_.size).sum
    info(s"q157 filtered graph recall@5 over 100 queries = $recall")
    assert(recall >= 0.72d, s"filtered recall $recall below the IVF bar")
    // predicate-agnostic traversal: the UNFILTERED q151 answer over
    // the same staged index is unchanged by the filtered pool riding
    // the state (the filter constrains collection, never navigation)
    val unfiltered = GraphServe.graphSearchBatch(spark, sf, 10, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unfiltered.exists { case (_, n) => !labelIds.contains(n) },
      "sanity: the unfiltered walk should reach non-matching nodes")
    val plan = GraphServe.graphSearchFilteredBatch(spark, sf, 10, 5, label)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("filtered HIERARCHICAL serving composes the q157 collection " +
    "pool with the q154 descent: recall clears the bar vs the " +
    "filtered exact answer, neighbors are label-pure, and repeats " +
    "are deterministic") {
    val label = 3
    val emb = Tables.embeddings(spark, sf)
    val exact = pairsOf(Similarity.knnBruteFiltered(emb, 100, 5, label))
    def run() = GraphServe.graphSearchHierFilteredBatch(spark, sf,
        nQueries = 100, k = 5, label = label)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "filtered hier serving must be deterministic")
    val got = first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val labelIds = emb.filter(col("label") === label)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.values.flatten.foreach(n => assert(labelIds.contains(n),
      s"neighbor $n does not carry label $label"))
    val recall = exact.keys.toSeq
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / exact.values.map(_.size).sum
    info(s"filtered hier recall@5 over 100 queries = $recall")
    assert(recall >= 0.72d, s"filtered hier recall $recall below the bar")
  }

  test("q158 SQ8 serving: recall clears the IVF bar, the quantized " +
    "edge table is materially smaller than the fp one, repeats are " +
    "deterministic, and the plan holds no cartesian join") {
    def run() = SparkEntry.queries("q158_knn_graph_sq8")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "sq8 serving must be deterministic")
    val recall = recallVsBrute(100,
      first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    info(s"q158 sq8 recall@5 over 100 queries = $recall")
    assert(recall >= 0.72d, s"recall@5 $recall below the IVF bar")
    // footprint: the quantized edge table must realize the 8-bit cut
    // on disk — the whole point of the entry (the embedded vectors
    // dominate the index, so the ratio should be well under half)
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val fp = dirBytes(new java.io.File(
      s"${NnDescent.graphIndexStaged(spark, sf)}/edges"))
    val q8 = dirBytes(new java.io.File(
      s"${GraphServe.graphSq8IndexStaged(spark, sf)}/edges"))
    info(s"q158 footprint: fp edges $fp B, sq8 edges $q8 B, " +
      f"ratio ${q8.toDouble / fp}%.3f")
    assert(q8 > 0 && fp > 0)
    assert(q8.toDouble / fp <= 0.5,
      s"sq8 edge table ($q8 B) is not materially smaller than fp ($fp B)")
    val plan = GraphServe.graphSearchSq8Batch(spark, sf, 10, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q164 graph delete: no tombstoned node is ever served, recall " +
    "clears the IVF bar vs the SURVIVING exact answer, the walk stays " +
    "predicate-agnostic, repeats are deterministic, and the plan holds " +
    "no cartesian join") {
    val emb = Tables.embeddings(spark, sf)
    // exact ground truth over the surviving corpus, for the surviving
    // query set — the contract a post-delete query actually has
    val exact = pairsOf(Similarity.knnBrute(
      emb.filter(col("vec_id") % 10 =!= 5), 100, 5))
    assert(exact.nonEmpty)
    def run() = SparkEntry.queries("q164_knn_graph_delete")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "delete serving must be deterministic")
    // a retracted vector can never be served; queries are survivors
    first.foreach { case (q, n) =>
      assert(q % 10 != 5, s"victim $q queried post-delete")
      assert(n % 10 != 5, s"victim $n served post-delete")
    }
    val got = first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / exact.values.map(_.size).sum
    info(s"q164 delete graph recall@5 = $recall")
    assert(recall >= 0.72d, s"delete recall $recall below the IVF bar")
    // staleness differential (the q163 criterion, graph form): the
    // PRE-delete walk over the same index still serves victims — the
    // tombstone set constrains collection, never the graph bytes
    val pre = GraphServe.graphSearchBatch(spark, sf, 100, 5)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(pre.exists(_ % 10 == 5),
      "differential vacuous: no victim in any pre-delete top-k")
    val plan = GraphServe.graphSearchDeleted(spark, sf, 10, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q170 graph delete compaction: every serving table is physically " +
    "erased, no victim is ever served, recall clears the IVF bar vs the " +
    "surviving exact answer, repeats are deterministic, and the plan " +
    "touches neither the tombstones nor the pre-compaction index") {
    val emb = Tables.embeddings(spark, sf)
    val exact = pairsOf(Similarity.knnBrute(
      emb.filter(col("vec_id") % 10 =!= 5), 100, 5))
    assert(exact.nonEmpty)
    def run() = SparkEntry.queries("q170_knn_graph_delete_compact")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    assert(first === run(), "compacted serving must be deterministic")
    first.foreach { case (q, n) =>
      assert(q % 10 != 5, s"victim $q queried post-compaction")
      assert(n % 10 != 5, s"victim $n served post-compaction")
    }
    val got = first.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / exact.values.map(_.size).sum
    info(s"q170 compacted graph recall@5 = $recall")
    assert(recall >= 0.72d, s"compacted recall $recall below the IVF bar")
    // physical erasure on every table the serving path reads
    val root = GraphServe.graphDeleteCompactIndexStaged(spark, sf)
    assert(spark.read.parquet(s"$root/edges")
      .filter(col("src") % 10 === 5 || col("dst") % 10 === 5)
      .count() === 0, "victim bytes survived in the compacted edges")
    assert(spark.read.parquet(s"$root/vecs")
      .filter(col("vec_id") % 10 === 5).count() === 0,
      "victim bytes survived in the compacted vecs")
    assert(spark.read.parquet(s"$root/entries")
      .filter(col("entry_id") % 10 === 5).count() === 0,
      "the entry sample names a victim")
    // meta carries the survivor count
    assert(spark.read.parquet(s"$root/meta").head().getLong(0) ===
      emb.filter(col("vec_id") % 10 =!= 5).count())
    // the serve reads only the compacted artifact: its published
    // oracle roots point at the nngdc stage (the per-hop state is
    // checkpointed, so the final frame's lineage shows RDD leaves —
    // the staged-roots var is the readable evidence of what was read)
    val df = GraphServe.graphSearchDeleteCompacted(spark, sf, 10, 5)
    df.collect()
    val (servedRoot, _) = GraphServe.graphCompactOracleRoots.get
    assert(servedRoot.contains("graft_nngdc_"),
      s"compacted serve ran against $servedRoot, not the nngdc stage")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("the driver-side entry slot hash equals the SQL xxhash64 twin " +
    "(the batch/interactive identity precondition)") {
    import spark.implicits._
    val rows = Seq((3L, 1), (3L, 5), (77L, 2), (1_000_003L, 8))
    val sql = rows.toDF("q", "j")
      .select(xxhash64(col("q"), col("j"), lit("gs-entry")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val driver = rows.map { case (q, j) => NnDescent.entrySlotHash(q, j) }
    assert(driver === sql)
  }
}
