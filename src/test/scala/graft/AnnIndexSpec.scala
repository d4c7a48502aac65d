package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Similarity}
import graft.sources.Tables

/** q77/q78 — persisted ANN indexes. The contract: (1) the indexed query
  * returns BIT-IDENTICAL rows to its build-per-batch twin (training is
  * deterministic, the persisted frames are the twin's in-flight
  * frames); (2) the build is idempotent — a second invocation reuses
  * the materialized index untouched; (3) the indexed plan reads the
  * index, with no training/encode stages (structurally impossible: the
  * query path never references them — asserted here by the plan's leaf
  * scans). */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** Root paths of every file-source leaf in the optimized plan.
    * `LogicalRelation.toString` omits the location in Spark 4, so the
    * path must come from the underlying HadoopFsRelation. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }

  /** (path, length, mtime) of every file under an index root. */
  private def fileStates(root: String): Seq[(String, Long, Long)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    while (it.hasNext) {
      val st = it.next()
      buf += ((st.getPath.toString, st.getLen, st.getModificationTime))
    }
    buf.sortBy(_._1).toSeq
  }

  test("IVF: indexed search is bit-identical to the build-per-batch twin") {
    val fresh = rows(Similarity.knnIvf(
      Tables.embeddings(spark, sf), nQueries = 10, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val indexed = rows(AnnIndex.knnIvfIndexed(spark, sf, nQueries = 10, k = 5))
    assert(indexed === fresh)
  }

  test("IVF: second build invocation reuses the index untouched") {
    val idx = AnnIndex.ivfIndex(spark, sf)
    val before = fileStates(idx)
    assert(before.nonEmpty)
    val idx2 = AnnIndex.ivfIndex(spark, sf)
    assert(idx2 === idx)
    assert(fileStates(idx) === before)
  }

  test("IVF: indexed plan scans the persisted lists, not a fresh assignment") {
    val df = AnnIndex.knnIvfIndexed(spark, sf, nQueries = 10, k = 5)
    val leaves = scanPaths(df)
    assert(leaves.exists(_.contains("graft_ivf_")),
      s"expected an index scan among leaves:\n${leaves.mkString("\n")}")
    // no aggregate anywhere in the plan: training (Lloyd means) and
    // assignment (max_by) are both aggregates, and the pure query path
    // has none — probes and top-k are windows/joins only
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.isEmpty, s"indexed IVF plan must not train/assign:\n${aggs.mkString("\n")}")
  }

  test("IVF append: appended search is bit-identical to a from-scratch union assignment") {
    import org.apache.spark.sql.functions.col
    val (baseRoot, deltaRoot) = AnnIndex.ivfDeltaIndex(spark, sf)
    // from-scratch: assign the WHOLE corpus under the same (base-slice-
    // trained) frozen centroids, probe identically
    val cent = spark.read.parquet(s"$baseRoot/centroids")
    val all = Similarity.prepared(Tables.embeddings(spark, sf))
    val fresh = rows(Similarity.ivfProbe(
      Similarity.assignToCentroids(all, cent), cent,
      all.filter(col("vec_id") < 10), nProbe = 32, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val appended = rows(AnnIndex.knnIvfAppended(spark, sf, nQueries = 10, k = 5))
    assert(appended === fresh)
    assert(appended.nonEmpty)
  }

  test("IVF append: delta segment holds exactly the arrivals; segments are disjoint and complete") {
    import org.apache.spark.sql.functions.col
    val (baseRoot, deltaRoot) = AnnIndex.ivfDeltaIndex(spark, sf)
    val all = Tables.embeddings(spark, sf)
    val nAll = all.count()
    val nDelta = all.filter(col("vec_id") % 10 === 0).count()
    val base = spark.read.parquet(s"$baseRoot/lists")
    val delta = spark.read.parquet(s"$deltaRoot/lists")
    assert(delta.count() === nDelta)
    assert(base.count() === nAll - nDelta)
    assert(delta.filter(col("vec_id") % 10 =!= 0).count() === 0)
    assert(base.filter(col("vec_id") % 10 === 0).count() === 0)
  }

  test("IVF append: rebuilding appends nothing — both segments reused untouched") {
    val (baseRoot, deltaRoot) = AnnIndex.ivfDeltaIndex(spark, sf)
    val b0 = fileStates(baseRoot)
    val d0 = fileStates(deltaRoot)
    assert(b0.nonEmpty && d0.nonEmpty)
    val (b2, d2) = AnnIndex.ivfDeltaIndex(spark, sf)
    assert((b2, d2) === ((baseRoot, deltaRoot)))
    assert(fileStates(baseRoot) === b0)
    assert(fileStates(deltaRoot) === d0)
  }

  test("IVF append: query plan scans both segments and never re-assigns") {
    val df = AnnIndex.knnIvfAppended(spark, sf, nQueries = 10, k = 5)
    val leaves = scanPaths(df)
    assert(leaves.exists(_.contains("graft_ivfb_")) &&
      leaves.exists(_.contains("graft_ivfd_")),
      s"expected base+delta index scans among leaves:\n${leaves.mkString("\n")}")
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.isEmpty,
      s"appended IVF query must not train/assign:\n${aggs.mkString("\n")}")
  }

  test("IVF compact: compacted search is bit-identical to the appended search") {
    val appended = rows(AnnIndex.knnIvfAppended(spark, sf, nQueries = 10, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val compacted = rows(AnnIndex.knnIvfCompacted(spark, sf, nQueries = 10, k = 5))
    assert(compacted === appended)
    assert(compacted.nonEmpty)
  }

  test("IVF compact: lists hold exactly the segment union; probe plan prunes and never re-assigns") {
    import org.apache.spark.sql.functions.col
    val (baseRoot, deltaRoot) = AnnIndex.ivfDeltaIndex(spark, sf)
    val idx = AnnIndex.ivfCompactIndex(spark, sf)
    val compacted = spark.read.parquet(s"$idx/lists")
    val base = spark.read.parquet(s"$baseRoot/lists")
    val delta = spark.read.parquet(s"$deltaRoot/lists")
    assert(compacted.count() === base.count() + delta.count())
    // assignments verbatim: every (vec_id, cluster) pair survives
    assert(compacted.select("vec_id", "cluster")
      .exceptAll(base.select("vec_id", "cluster")
        .unionByName(delta.select("vec_id", "cluster"))).count() === 0)
    val df = AnnIndex.knnIvfCompacted(spark, sf, nQueries = 10, k = 5)
    val leaves = scanPaths(df)
    assert(leaves.exists(_.contains("graft_ivfc_")),
      s"expected a compacted-index scan among leaves:\n${leaves.mkString("\n")}")
    assert(!leaves.exists(_.contains("graft_ivfb_")) &&
      !leaves.exists(_.contains("graft_ivfd_")),
      "compacted probe must not touch the pre-compaction segments")
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.isEmpty, s"compacted IVF probe must not train/assign:\n${aggs.mkString("\n")}")
  }

  test("IVF retrain: retrained index equals the from-scratch full index bit-for-bit") {
    val retrained = AnnIndex.ivfRetrainIndex(spark, sf)
    val scratch = AnnIndex.ivfIndex(spark, sf)
    assert(rows(spark.read.parquet(s"$retrained/centroids")).sorted ===
      rows(spark.read.parquet(s"$scratch/centroids")).sorted)
    assert(rows(spark.read.parquet(s"$retrained/lists")).sorted ===
      rows(spark.read.parquet(s"$scratch/lists")).sorted)
    val viaRetrain = rows(AnnIndex.knnIvfRetrained(spark, sf, nQueries = 10, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val viaScratch = rows(AnnIndex.knnIvfIndexed(spark, sf, nQueries = 10, k = 5))
    assert(viaRetrain === viaScratch)
    assert(viaRetrain.nonEmpty)
  }

  test("IVF maintenance: both ops are idempotent — re-invocation touches no file") {
    val c = AnnIndex.ivfCompactIndex(spark, sf)
    val r = AnnIndex.ivfRetrainIndex(spark, sf)
    val c0 = fileStates(c)
    val r0 = fileStates(r)
    assert(c0.nonEmpty && r0.nonEmpty)
    assert(AnnIndex.ivfCompactIndex(spark, sf) === c)
    assert(AnnIndex.ivfRetrainIndex(spark, sf) === r)
    assert(fileStates(c) === c0)
    assert(fileStates(r) === r0)
  }

  test("PQ: indexed search is bit-identical to the build-per-batch twin") {
    val fresh = rows(Similarity.knnPq(
      Tables.embeddings(spark, sf), nQueries = 10, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val indexed = rows(AnnIndex.knnPqIndexed(spark, sf, nQueries = 10, k = 5))
    assert(indexed === fresh)
  }

  test("PQ: second build invocation reuses the index untouched") {
    val idx = AnnIndex.pqIndex(spark, sf)
    val before = fileStates(idx)
    assert(before.nonEmpty)
    val idx2 = AnnIndex.pqIndex(spark, sf)
    assert(idx2 === idx)
    assert(fileStates(idx) === before)
  }

  test("PQ: indexed plan scans persisted codes; only the bounded LUT aggregate remains") {
    val df = AnnIndex.knnPqIndexed(spark, sf, nQueries = 10, k = 5)
    val leaves = scanPaths(df)
    assert(leaves.exists(_.contains("graft_pq_")),
      s"expected an index scan among leaves:\n${leaves.mkString("\n")}")
    // the only aggregates a pure PQ query needs are the per-query LUT
    // builds (grouped on query_id, bounded by |Q| x m*k); training means
    // (grouped on sub/cid) and the codebook map collapse must be gone
    val badAggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if !a.groupingExpressions.exists(_.references.exists(_.name == "query_id")) => a
    }
    assert(badAggs.isEmpty,
      s"indexed PQ plan must not train/encode:\n${badAggs.mkString("\n")}")
  }

  // ---- q138 cluster-quality audit ---------------------------------------

  test("cluster quality: hand-computed simplified silhouettes are exact") {
    import spark.implicits._
    // unit-norm 2-d fixture: p1 sits ON its centroid (sil = 1), p2 at
    // cos 0.8 to its own and 0.6 to the other (sil = 0.5)
    val lists = Seq(
      (1L, Seq(1.0, 0.0), 1.0, 10L),
      (2L, Seq(0.6, 0.8), 1.0, 20L))
      .toDF("vec_id", "emb", "nrm", "cluster")
    val cent = Seq(
      (10L, Seq(1.0, 0.0), 1.0),
      (20L, Seq(0.0, 1.0), 1.0))
      .toDF("cent_id", "c_emb", "c_nrm")
    val out = AnnIndex.clusterQualityOf(lists, cent).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((10L, 1L, 1000000L), (20L, 1L, 500000L)))
  }

  test("cluster quality: a vector equal to both centroids yields 0, not NaN") {
    import spark.implicits._
    val lists = Seq((1L, Seq(1.0, 0.0), 1.0, 10L))
      .toDF("vec_id", "emb", "nrm", "cluster")
    val cent = Seq(
      (10L, Seq(1.0, 0.0), 1.0),
      (20L, Seq(1.0, 0.0), 1.0)).toDF("cent_id", "c_emb", "c_nrm")
    val out = AnnIndex.clusterQualityOf(lists, cent).collect()
    assert(out.head.getLong(2) === 0L)
  }

  test("q138 audits every indexed vector and stays inside silhouette bounds") {
    val out = SparkEntry.queries("q138_cluster_quality")(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === total)
    out.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      val sum = r.getAs[Long]("sum_sil_u")
      val min = r.getAs[Long]("min_sil_u")
      assert(min >= -1000000L && min <= 1000000L)
      assert(sum >= -1000000L * n && sum <= 1000000L * n)
      assert(min * n <= sum)
    }
    assert(SparkEntry.oracleSql("q138_cluster_quality").contains("read_parquet"))
  }

  test("q162 PQ append: the union segments encode bit-identically to " +
    "a one-segment encode under the same frozen codebooks, the stale " +
    "base lacks every delta id, delta-query recall clears the PQ " +
    "floor, and staging is idempotent + deterministic") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val (baseRoot, deltaRoot) = AnnIndex.pqDeltaIndex(spark, sf)
    // idempotent staging
    assert(AnnIndex.pqDeltaIndex(spark, sf) === ((baseRoot, deltaRoot)))
    val deltaIds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect().toSet
    assert(deltaIds.nonEmpty)
    val baseIds = spark.read.parquet(s"$baseRoot/codes")
      .select("vec_id").as[Long].collect().toSet
    // staleness differential: the pre-append segment holds no arrival
    assert((baseIds & deltaIds).isEmpty, "stale base segment holds delta ids")
    val unionCodes = spark.read.parquet(s"$baseRoot/codes")
      .unionByName(spark.read.parquet(s"$deltaRoot/codes"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(unionCodes.length === baseIds.size + deltaIds.size)
    // segment-union == one-segment encode of the WHOLE corpus under
    // the same frozen codebooks (the q124 compaction identity, PQ
    // form): appending is sound exactly because encode is per-row
    val oneSegment = Similarity.pqEncode(
        Similarity.pqPrepared(Tables.embeddings(spark, sf), 64),
        spark.read.parquet(s"$baseRoot/codebooks"), 8, 8, 64)
      .select("vec_id", "codes")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(unionCodes === oneSegment,
      "union-of-segments diverged from the one-segment encode")
    // delta-query recall vs exact clears the PQ floor; deterministic
    def pairs(df: DataFrame) = df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val res = SparkEntry.queries("q162_knn_pq_append")(spark, sf)
    val got = pairs(res)
    assert(rows(res) === rows(AnnIndex.knnPqAppended(spark, sf, k = 5)),
      "appended probe must be deterministic")
    val exact = pairs(
      Similarity.knnBrute(Tables.embeddings(spark, sf), 100, 5))
    val deltaQs = exact.keys.filter(_ % 10 == 0).toSeq
    assert(deltaQs.nonEmpty)
    val recall = deltaQs
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / (deltaQs.size * 5)
    info(s"q162 delta-query recall@5 = $recall")
    assert(recall >= 0.5d, s"delta recall $recall below the PQ floor")
  }

  test("q156 filtered ANN: recall clears the IVF bar vs the FILTERED " +
    "exact answer, every neighbor carries the constraint label, the " +
    "predicate reaches the lists scan as a PartitionFilter, and " +
    "repeats are deterministic") {
    import org.apache.spark.sql.functions.col
    val label = 3
    val emb = Tables.embeddings(spark, sf)
    def pairs(df: DataFrame) = df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairs(Similarity.knnBruteFiltered(emb, 100, 5, label))
    val res = AnnIndex.knnIvfFiltered(spark, sf, nQueries = 100, k = 5,
      label = label)
    val first = res.collect().map(_.toString).toSeq
    assert(first === AnnIndex.knnIvfFiltered(spark, sf, 100, 5, label)
      .collect().map(_.toString).toSeq, "filtered probe must be deterministic")
    val got = pairs(res)
    // constraint correctness: no neighbor outside the label slice
    val labelIds = emb.filter(col("label") === label)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.values.flatten.foreach(n => assert(labelIds.contains(n),
      s"neighbor $n does not carry label $label"))
    // recall vs the filtered ground truth — the contract a
    // constrained query actually has
    val recall = exact.keys.toSeq
      .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size).sum
      .toDouble / exact.values.map(_.size).sum
    info(s"q156 filtered recall@5 over 100 queries = $recall")
    assert(recall >= 0.72d, s"filtered recall $recall below the IVF bar")
    // the label predicate must prune PARTITIONS of the lists scan —
    // non-matching labels are never read
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      """PartitionFilters: \[[^\]]*label""".r.findFirstIn(plan).isDefined,
      s"label predicate did not reach the lists scan as a partition filter")
    assert(!plan.contains("CartesianProduct"))
  }

  // ---- q163: vector DELETE (tombstones) ----

  test("q163 delete: staleness differential — pre-delete probes serve " +
      "victims, post-delete probes never do") {
    import org.apache.spark.sql.functions.col
    // pre-delete: the q77 probe over the same surviving query set
    // still serves tombstoned neighbors (the vectors are in the lists)
    val pre = AnnIndex.knnIvfIndexed(spark, sf, nQueries = 100, k = 5)
      .filter(col("query_id") % 10 =!= 5)
    assert(pre.filter(col("neighbor_id") % 10 === 5).count() > 0,
      "differential vacuous: no victim appears in any pre-delete top-k")
    val post = AnnIndex.knnIvfDeleted(spark, sf, nQueries = 100, k = 5)
    assert(post.filter(col("neighbor_id") % 10 === 5).count() === 0,
      "a tombstoned vector was served post-delete")
    assert(post.count() > 0)
    // every query still gets a full answer: victims are backfilled by
    // the next-best survivors, never by a shorter result
    assert(post.groupBy("query_id").count()
      .filter(col("count") =!= 5).count() === 0)
  }

  test("q163 delete: tombstone anti-join equals the predicate mask, " +
      "and the probe is deterministic") {
    import org.apache.spark.sql.functions.col
    val idx = AnnIndex.ivfIndex(spark, sf)
    val cent = spark.read.parquet(s"$idx/centroids")
    val masked = spark.read.parquet(s"$idx/lists")
      .filter(col("vec_id") % 10 =!= 5)
    val q = Similarity.prepared(Tables.embeddings(spark, sf))
      .filter(col("vec_id") < 100 && col("vec_id") % 10 =!= 5)
    val expected = rows(Similarity.ivfProbe(masked, cent, q, 32, 5))
    val got = rows(AnnIndex.knnIvfDeleted(spark, sf, nQueries = 100, k = 5))
    assert(got === expected)
    assert(got === rows(AnnIndex.knnIvfDeleted(spark, sf, nQueries = 100, k = 5)))
  }

  test("q163 delete compaction: physically dropped rows, bit-identical " +
      "probes, no anti-join or pre-compaction segment in the plan") {
    import org.apache.spark.sql.functions.col
    val viaTombstone = rows(AnnIndex.knnIvfDeleted(spark, sf, nQueries = 100, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val df = AnnIndex.knnIvfDeleteCompacted(spark, sf, nQueries = 100, k = 5)
    assert(rows(df) === viaTombstone)
    // masked rows are gone physically; survivors verbatim
    val idx = AnnIndex.ivfDeleteCompactIndex(spark, sf)
    val lists = spark.read.parquet(s"$idx/lists")
    assert(lists.filter(col("vec_id") % 10 === 5).count() === 0)
    val full = spark.read.parquet(s"${AnnIndex.ivfIndex(spark, sf)}/lists")
    assert(lists.count() === full.filter(col("vec_id") % 10 =!= 5).count())
    // the compacted probe plan reads only the compacted artifact — no
    // tombstone segment, no anti-join
    val leaves = scanPaths(df)
    assert(leaves.exists(_.contains("graft_ivfdc_")),
      s"expected the delete-compacted scan among leaves:\n${leaves.mkString("\n")}")
    assert(!leaves.exists(_.contains("graft_ivft_")),
      "compacted probe must not touch the tombstone segment")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType.sql.contains("ANTI") => j
    }
    assert(joins.isEmpty, "compacted probe must carry no anti-join")
  }

  test("q167 PQ delete: anti-join equals the predicate mask, victims are " +
      "served pre-delete and never post-delete") {
    import org.apache.spark.sql.functions.col
    // staleness differential on the PQ path
    val pre = AnnIndex.knnPqIndexed(spark, sf, nQueries = 100, k = 5)
      .filter(col("query_id") % 10 =!= 5)
    assert(pre.filter(col("neighbor_id") % 10 === 5).count() > 0,
      "differential vacuous: no victim in any pre-delete PQ top-k")
    val post = AnnIndex.knnPqDeleted(spark, sf, nQueries = 100, k = 5)
    assert(post.filter(col("neighbor_id") % 10 === 5).count() === 0,
      "a tombstoned vector was served by the PQ delete probe")
    // anti-join == predicate mask, bit for bit
    val idx = AnnIndex.pqIndex(spark, sf)
    val cb = spark.read.parquet(s"$idx/codebooks")
    val masked = spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") % 10 =!= 5)
    val e = Similarity.pqPrepared(Tables.embeddings(spark, sf), 64)
    val expected = rows(Similarity.pqAdcSearch(masked, cb,
      e.filter(col("vec_id") < 100 && col("vec_id") % 10 =!= 5), e,
      5, 8, 8, 64, 256))
    val got = rows(AnnIndex.knnPqDeleted(spark, sf, nQueries = 100, k = 5))
    assert(got === expected)
    assert(got === rows(AnnIndex.knnPqDeleted(spark, sf, nQueries = 100, k = 5)))
  }

  test("q169 PQ delete compaction: physically dropped rows, bit-identical " +
      "probes, no anti-join or tombstone segment in the plan") {
    import org.apache.spark.sql.functions.col
    val viaTombstone = rows(AnnIndex.knnPqDeleted(spark, sf, nQueries = 100, k = 5))
    spark.sharedState.cacheManager.clearCache()
    val df = AnnIndex.knnPqDeleteCompacted(spark, sf, nQueries = 100, k = 5)
    // mask-then-scan == scan-the-masked-rewrite (the ADC scan is
    // per-vector, so the two commute bit for bit)
    assert(rows(df) === viaTombstone)
    // masked rows are gone physically; survivors verbatim
    val idx = AnnIndex.pqDeleteCompactIndex(spark, sf)
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.filter(col("vec_id") % 10 === 5).count() === 0)
    val full = spark.read.parquet(s"${AnnIndex.pqIndex(spark, sf)}/codes")
    assert(codes.count() === full.filter(col("vec_id") % 10 =!= 5).count())
    // codebooks verbatim (compaction never retrains)
    assert(spark.read.parquet(s"$idx/codebooks")
      .exceptAll(spark.read.parquet(
        s"${AnnIndex.pqIndex(spark, sf)}/codebooks")).count() === 0)
    // the compacted probe plan reads only the compacted artifact
    val leaves = scanPaths(df)
    assert(leaves.exists(_.contains("graft_pqdc_")),
      s"expected the compacted PQ scan among leaves:\n${leaves.mkString("\n")}")
    assert(!leaves.exists(_.contains("graft_ivft_")),
      "compacted PQ probe must not touch the tombstone segment")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType.sql.contains("ANTI") => j
    }
    assert(joins.isEmpty, "compacted PQ probe must carry no anti-join")
  }

  test("q163 delete: tombstone and compaction staging are idempotent") {
    val ts = AnnIndex.tombstonesStaged(spark, sf)
    val dc = AnnIndex.ivfDeleteCompactIndex(spark, sf)
    val ts0 = fileStates(ts)
    val dc0 = fileStates(dc)
    assert(ts0.nonEmpty && dc0.nonEmpty)
    assert(AnnIndex.tombstonesStaged(spark, sf) === ts)
    assert(AnnIndex.ivfDeleteCompactIndex(spark, sf) === dc)
    assert(fileStates(ts) === ts0)
    assert(fileStates(dc) === dc0)
  }
}
