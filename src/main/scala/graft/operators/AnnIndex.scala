package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Persisted ANN index structures — the write-once/read-many economics
  * the layout family ([[Bucketed]]/[[Partitioned]]/[[Layout]]) applies
  * to joins and scans, applied to similarity search: the IVF inverted
  * lists and the PQ codebooks+codes are MATERIALIZED once per (dataset,
  * params, content) under `target/ann/`, so every later query batch
  * skips training and encoding entirely and reads the index like any
  * other table.
  *
  * Without this, [[Similarity.knnIvf]]/[[Similarity.knnPq]] rebuild
  * their index per query batch — bounded work, but work a production
  * vector store amortizes across millions of queries. At 100 TB the
  * build is a one-off corpus pass (assignment / encode, both map-only
  * after a broadcast-sided train) and the queryable artifact is tiny
  * relative to the corpus: IVF lists carry the vectors re-keyed by
  * cluster; PQ codes carry m BYTES per vector (the 64× memory cut).
  *
  * Index layout on disk:
  *   - IVF: `centroids/` (C rows) + `lists/` PARTITIONED BY cluster —
  *     a probe reads only its nProbe clusters' directories (Hive-style
  *     partition pruning, the [[Partitioned]] mechanics), so query cost
  *     tracks nProbe/C of the corpus, not the corpus.
  *   - PQ: `codebooks/` (m·k rows) + `codes/` (vec_id, codes).
  *
  * Cache keys fold in [[Layout.contentKey]]'s file fingerprint, so a
  * source that changes under the same path invalidates the index
  * instead of silently serving stale neighbors. Builds are
  * `synchronized` (same-JVM) and committed by atomic rename via
  * [[Staging]] — a half-built index (crash between writes, or a
  * concurrent process mid-build) is invisible to readers, never
  * served.
  *
  * Both indexed query paths return BIT-IDENTICAL results to their
  * build-per-batch twins (q29/q74): training is deterministic
  * (hash-order sampling, decimal-domain means) and the persisted frames
  * are exactly the frames the twins compute in-flight — asserted in
  * AnnIndexSpec by frame-for-frame equality.
  */
object AnnIndex {
  import Bucketed.md5hex

  /** Idempotently materialize the IVF index for `dir`'s embeddings:
    * `centroids/` + cluster-partitioned `lists/`. Returns the index
    * root. */
  def ivfIndex(spark: SparkSession, dir: String, centroids: Int = 256,
      lloydIters: Int = 3): String = synchronized {
    val out = "target/ann/graft_ivf_" + md5hex(
      s"$dir/$centroids/$lloydIters/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val e = Similarity.prepared(Tables.embeddings(spark, dir))
      val cent = Similarity.ivfCentroids(e, centroids, lloydIters)
      cent.write.mode("overwrite").parquet(s"$tmp/centroids")
      // one corpus assignment pass, written re-keyed by cluster: each
      // inverted list is a partition directory, so a probe is a
      // partition-pruned read touching nProbe/C of the data
      Similarity.assignToCentroids(e, cent)
        .write.mode("overwrite").partitionBy("cluster").parquet(s"$tmp/lists")
      // build is one-shot: release the centroid cache the in-flight
      // twin (knnIvf) keeps under the session cache contract
      cent.unpersist()
    }
  }

  /** IVF query over the persisted index — [[Similarity.ivfProbe]] fed by
    * index scans instead of a fresh train+assign. The cluster equi-join
    * against the broadcast probe side prunes the partitioned lists
    * (dynamic partition pruning); no training or corpus-assignment
    * stage exists in this plan at all. */
  def knnIvfIndexed(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      centroids: Int = 256, nProbe: Int = 32, lloydIters: Int = 3): DataFrame = {
    val idx = ivfIndex(spark, dir, centroids, lloydIters)
    val cent = spark.read.parquet(s"$idx/centroids")
    val lists = spark.read.parquet(s"$idx/lists")
    val q = Similarity.prepared(Tables.embeddings(spark, dir))
      .filter(col("vec_id") < nQueries)
    Similarity.ivfProbe(lists, cent, q, nProbe, k)
  }

  /** Idempotently materialize the PQ index for `dir`'s embeddings:
    * `codebooks/` (m·k sub-centroids) + `codes/` (m code bytes per
    * vector). Returns the index root. */
  def pqIndex(spark: SparkSession, dir: String, m: Int = 8,
      kCent: Int = 64, d: Int = 64): String = synchronized {
    require(d % m == 0, s"dim $d not divisible by $m subspaces")
    val out = "target/ann/graft_pq_" + md5hex(
      s"$dir/$m/$kCent/$d/${Layout.contentKey(spark, s"$dir/embeddings.parquet")}")
      .take(8)
    Staging.ensure(spark, out) { tmp =>
      val subdim = d / m
      val e = Similarity.pqPrepared(Tables.embeddings(spark, dir), d)
      val cb = Similarity.pqCodebooks(e, m, subdim, kCent)
      cb.write.mode("overwrite").parquet(s"$tmp/codebooks")
      Similarity.pqEncode(e, cb, m, subdim, kCent)
        .select("vec_id", "codes")
        .write.mode("overwrite").parquet(s"$tmp/codes")
      cb.unpersist()
    }
  }

  /** PQ/ADC query over the persisted index — [[Similarity.pqAdcSearch]]
    * fed by the materialized codebooks and codes: the plan contains the
    * LUT build (bounded: queries × m·k), the lookup-only scan, and the
    * candidates-only re-rank — no training, no encode. */
  def knnPqIndexed(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      m: Int = 8, kCent: Int = 64, candidates: Int = 256, d: Int = 64): DataFrame = {
    val idx = pqIndex(spark, dir, m, kCent, d)
    val cb = spark.read.parquet(s"$idx/codebooks")
    val codes = spark.read.parquet(s"$idx/codes")
    val e = Similarity.pqPrepared(Tables.embeddings(spark, dir), d)
    Similarity.pqAdcSearch(codes, cb, e.filter(col("vec_id") < nQueries), e,
      k, m, d / m, kCent, candidates)
  }

  val queries: Seq[Query] = Seq(

    Query(
      "q77_knn_ivf_indexed",
      "q29's IVF search over a PERSISTED index: inverted lists " +
        "materialized once per (dataset, params, content) under target/, " +
        "partitioned by cluster so each probe is a partition-pruned read " +
        "touching nProbe/C of the corpus; repeated query batches skip " +
        "training and assignment entirely. Bit-identical to q29 " +
        "(deterministic training; asserted in AnnIndexSpec). No oracle: " +
        "approximate by design — gated by the q29 equality instead.",
      (s, dir) => knnIvfIndexed(s, dir, nQueries = 10, k = 5)),

    Query(
      "q78_knn_pq_indexed",
      "q74's PQ/ADC search over a PERSISTED index: codebooks + m-byte " +
        "codes materialized once per (dataset, params, content) under " +
        "target/; repeated query batches run only the LUT build, the " +
        "lookup-only ADC scan, and the candidates-only re-rank — no " +
        "training or encode stages in the query plan. Bit-identical to " +
        "q74 (asserted in AnnIndexSpec). No oracle: approximate by " +
        "design — gated by the q74 equality instead.",
      (s, dir) => knnPqIndexed(s, dir, nQueries = 10, k = 5))
  )
}
