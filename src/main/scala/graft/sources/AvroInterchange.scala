package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange — the remaining common warehouse
  * boundary next to parquet (native), ORC (q128), JSONL (q120), CSV
  * and fixed-width binary (the reference formats). This deployment has
  * no `spark-avro` datasource module on the classpath, so the boundary
  * is built directly on the PUBLIC Avro-on-Hadoop stack that IS
  * shipped with Spark (`avro` + `avro-mapred` jars):
  *
  *   - WRITE: `saveAsNewAPIHadoopFile` with `AvroKeyOutputFormat` — a
  *     map-only job (no shuffle; records are created and written inside
  *     the task), one container file per partition, schema carried in
  *     each file header the standard Avro way.
  *   - READ: `newAPIHadoopFile` with `AvroKeyInputFormat` — Avro
  *     container files are block-structured with sync markers, so the
  *     input format SPLITS them like any Hadoop text/sequence source: a
  *     100 TB Avro drop parallelizes across executors without the
  *     writer having to pre-size files. The reader is SCHEMA-FIRST
  *     (the q120 discipline — no inference pass): the declared reader
  *     schema is projected via Avro schema resolution
  *     (`avro.schema.input.key`), so unused writer columns are never
  *     decoded.
  *
  * Supported field types are the interchange scalars (long, int,
  * double, float, boolean, string, binary), each mapped to the
  * nullable Avro union `[null, T]` — the general shape for
  * parquet-sourced frames whose columns are nullable.
  *
  * Hadoop record-reader objects are REUSED across `nextKeyValue()`
  * calls, so the record→Row conversion copies every field out inside
  * the same map call (`Utf8` → String, `ByteBuffer` → Array[Byte])
  * before the iterator advances — the classic Hadoop-RDD aliasing trap.
  */
object AvroInterchange {

  /** The Avro record schema for a DataFrame schema: each field the
    * nullable union `[null, T]`. */
  def avroSchemaFor(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"avro interchange supports scalar columns only, got $other for ${f.name}")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Seq(Schema.create(Schema.Type.NULL), base).asJava),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_row", null, "graft.avro", false,
      fields.toSeq.asJava)
  }

  /** Write `df` as Avro container files under `path` — map-only, one
    * file per partition, schema in every file header. */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchemaFor(sparkSchema).toString
    val rdd = df.rdd.mapPartitions { rows =>
      val sch = new Schema.Parser().parse(schemaJson)
      val n = sparkSchema.length
      rows.map { r =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < n) {
          val v =
            if (r.isNullAt(i)) null
            else sparkSchema(i).dataType match {
              case BinaryType => ByteBuffer.wrap(r.getAs[Array[Byte]](i))
              case _ => r.get(i).asInstanceOf[AnyRef]
            }
          rec.put(i, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    rdd.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files under `path` with the DECLARED reader
    * `schema` (schema-first — Avro schema resolution projects the
    * writer's records onto it, decoding only the declared columns). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", avroSchemaFor(schema).toString)
    val fields = schema.fields
    val rdd = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .map { case (k, _) =>
        // copy EVERY field out before the reader reuses the record
        val rec = k.datum()
        Row.fromSeq(fields.indices.map { i =>
          (rec.get(i), fields(i).dataType) match {
            case (null, _) => null
            case (v, StringType) => v.toString
            case (v: ByteBuffer, BinaryType) =>
              val a = new Array[Byte](v.remaining()); v.duplicate().get(a); a
            case (v, _) => v
          }
        })
      }
    spark.createDataFrame(rdd, schema)
  }
}
