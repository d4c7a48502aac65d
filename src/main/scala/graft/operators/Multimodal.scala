package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with a typed metadata struct, plus the three
  * operations a training pipeline runs over them — decode/feature
  * extraction, frame sampling, and payload statistics.
  *
  * The Spark-side plumbing (schema, batch iteration, partitioning, frame
  * arithmetic) is real and tested; the *codec* itself is a clearly-marked
  * deterministic STUB (`fakeDecode`) because no media libraries exist in
  * this environment. Swapping in a real decoder changes one function: the
  * per-record byte→feature step inside `extractFeatures`, which is the
  * same seam a `mapInPandas`/`mapPartitions` batch UDF gives you — batch
  * in, batch out, executor-local, no driver involvement.
  *
  * Scale shape: everything here is embarrassingly parallel (map-only —
  * no shuffle at all except the catalog query's final orderBy); payloads
  * never leave the executor that scanned them, which is the property
  * that matters when the binary column is 100 KB–100 MB per row.
  */
object Multimodal {

  /** A decoded media record: the fixed schema the (stubbed) decoder
    * must produce, mirroring a Pandas-UDF output schema. */
  final case class MediaFeature(
      doc_id: Long,
      nbytes: Int,
      checksum: Long,
      feature: Array[Float])

  /** Documents as (doc_id, payload BINARY, meta STRUCT<mime,nbytes>) —
    * the text body stands in for an opaque media blob; with real data
    * this is `spark.read.format("binaryFile")` or a parquet binary
    * column, same downstream shape. */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(encode(col("text"), "UTF-8")).as("nbytes")).as("meta"))

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. Real implementation would decode `bytes` with the media
    * library of choice; the surrounding batch plumbing is what this
    * module actually delivers. */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below.
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling state over the payload
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      val mixed = (h ^ (h >>> 33)) * (j * 2654435761L + 1)
      out(j) = ((mixed >>> 40).toInt.toFloat / (1 << 23)) - 0.5f
      j += 1
    }
    out
  }

  /** Batch feature extraction over payload partitions — the
    * `mapPartitions` seam where a real codec plugs in. Rows stream
    * through executor-local batches; output is a typed Dataset with the
    * fixed [[MediaFeature]] schema. */
  def extractFeatures(payloads: DataFrame, dim: Int = 8): Dataset[MediaFeature] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          var crc = 0L
          var i = 0
          while (i < bytes.length) { crc = crc * 31 + bytes(i); i += 1 }
          MediaFeature(id, bytes.length, crc, fakeDecode(bytes, dim))
        }
      }
  }

  /** Frame sampling: slice the payload into fixed-size chunks ("frames")
    * and keep every `stride`-th — pure expression work (`substring` on
    * binary), no UDF, stays in codegen. */
  def sampleFrames(payloadsDf: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    payloadsDf.select(col("doc_id"), col("meta.nbytes").as("nbytes"),
      posexplode(
        transform(
          sequence(lit(0), ceil(col("meta.nbytes").cast("double") / frameBytes).cast("int") - 1),
          i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)

  private val frameBytes = 64

  val queries: Seq[Query] = Seq(
    Query(
      "q23_multimodal",
      "Multimodal payload statistics: binary size and frame count per document " +
        s"(${frameBytes}-byte frames) — the oracle-checkable face of the binary-column " +
        "plumbing; decode/feature extraction is the stubbed executor-local batch " +
        "step, tested in ScalaTest.",
      (s: SparkSession, dir: String) => {
        val p = payloads(Tables.documents(s, dir))
        p.select(col("doc_id"), col("meta.nbytes").as("nbytes"),
          ceil(col("meta.nbytes").cast("double") / frameBytes).cast("int").as("n_frames"))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS nbytes,
               CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / $frameBytes) AS INT) AS n_frames
        FROM documents
        ORDER BY doc_id"""))
  )
}
