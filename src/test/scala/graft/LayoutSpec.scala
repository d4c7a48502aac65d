package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Tables

/** Physical-layout operators: the Z-order claim is about per-FILE key
  * geometry (square-ish 2-D boxes instead of full-width stripes), so the
  * spec measures the written files' min/max boxes directly — the same
  * statistics parquet footer pruning consults — rather than trusting the
  * sort. Compaction is about file arithmetic + content invisibility. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val nFiles = 24

  test("z-order files cover 2-D boxes, not full-width stripes") {
    val path = Layout.zorderedLineitem(spark, sf, nFiles)
    val boxes = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
      .groupBy("f")
      .agg(min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      .collect()
    assert(boxes.length === nFiles)
    val (pmin, pmax, smin, smax) = {
      val b = Tables.lineitem(spark, sf)
        .agg(min("l_partkey"), max("l_partkey"),
          min("l_suppkey"), max("l_suppkey")).head()
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    }
    val pSpan = (pmax - pmin + 1).toDouble
    val sSpan = (smax - smin + 1).toDouble
    val fracs = boxes.map { r => // columns: f, plo, phi, slo, shi
      ((r.getLong(2) - r.getLong(1) + 1) / pSpan,
        (r.getLong(4) - r.getLong(3) + 1) / sSpan)
    }
    // A 1-D sort on either key makes the OTHER key's fraction ~1.0 in
    // every file; Morton interleaving must bound BOTH dimensions for
    // most files (quadrant-straddling Morton intervals may blow up a
    // few boxes — that is inherent to the curve, hence the 70% bar).
    val balanced = fracs.count { case (pf, sfr) => pf <= 0.6 && sfr <= 0.6 }
    assert(balanced >= (nFiles * 0.7).toInt,
      s"only $balanced/$nFiles files have both dims <= 0.6: ${fracs.mkString(", ")}")
    // and the typical box AREA must track 1/nFiles, not 1.0
    val areas = fracs.map { case (pf, sfr) => pf * sfr }.sorted
    val median = areas(areas.length / 2)
    assert(median <= 6.0 / nFiles, s"median box area $median")
  }

  test("z-order box scan equals the same scan over the plain table") {
    val got = Layout.zorderBoxScan(spark, sf).orderBy("l_partkey").collect()
    val plain = Tables.lineitem(spark, sf)
      .filter(col("l_partkey").between(20, 59) &&
        col("l_suppkey").between(2, 5))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_partkey").collect()
    assert(got.map(_.toString).toSeq === plain.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }

  test("compaction bins to ceil(bytes/target) files and is content-invisible") {
    val target = 64L << 10 // small target so sf0.001 still yields several bins
    val (scattered, compacted) =
      Layout.compactedDocs(spark, sf, nSmall = 64, targetBytes = target)
    val fs = new Path(scattered)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(dir: String) = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles(scattered).length === 64)
    val totalBytes = parquetFiles(scattered).map(_.getLen).sum
    val expectFiles = math.max(1L, (totalBytes + target - 1) / target).toInt
    assert(parquetFiles(compacted).length === expectFiles)
    assert(expectFiles > 1 && expectFiles < 64) // the rewrite actually binned
    val before = spark.read.parquet(scattered)
      .orderBy("doc_id").collect().map(_.toString)
    val after = spark.read.parquet(compacted)
      .select(spark.read.parquet(scattered).columns.toIndexedSeq.map(col): _*)
      .orderBy("doc_id").collect().map(_.toString)
    assert(after.toSeq === before.toSeq)
  }

  test("morton16 spreads fractional-span (span < 1) double dimensions") {
    // The old quantizer used span (hi - lo + 1); on a double dimension
    // with true span < 1 the +1 dominated and collapsed nearly all
    // values into a handful of codes. Pin the fix: 1000 evenly-spaced
    // doubles in [0, 0.5) must spread across ~1000 distinct Morton
    // codes, and quantization must use the full 16-bit range (top cell
    // reached), not just the bottom sliver.
    import spark.implicits._
    val n = 1000
    val df = (0 until n).map(i => (i * 0.0005, i * 0.0005)).toDF("a", "b")
    val bounds = df.agg(
      min("a").as("alo"), max("a").as("ahi"),
      min("b").as("blo"), max("b").as("bhi"))
    val z = df.crossJoin(broadcast(bounds))
      .select(Layout.morton16(
        col("a"), col("alo"), col("ahi"),
        col("b"), col("blo"), col("bhi")).as("z"))
    val distinct = z.distinct().count()
    assert(distinct >= n * 9 / 10,
      s"only $distinct distinct Morton codes for $n distinct fractional keys " +
        "— the quantizer is collapsing a span-<1 dimension")
    // max interleaved code for qa==qb==65535 is 0xFFFFFFFF; reaching
    // >= the code for quantized cell 60000 proves the range isn't
    // squashed into the low cells.
    val zmax = z.agg(max("z")).head().getLong(0)
    assert(zmax > (3L << 30),
      s"max Morton code $zmax stuck in the low range — quantizer not using full 16 bits")
  }

  test("z-order layout rebuilds (new path) when the source table mutates") {
    // The _SUCCESS reuse gate keys on a CONTENT fingerprint
    // (name+len+mtime of the source files), not just the dir string: a
    // regenerated/overwritten source must produce a different layout
    // path and fresh files, never silently serve the stale clustering.
    val base = s"target/layout_mutation_${System.nanoTime()}"
    val srcDir = new Path(base)
    val fs = srcDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeSource(rows: Int): Unit =
      Tables.lineitem(spark, sf).limit(rows)
        .write.mode("overwrite").parquet(s"$base/lineitem.parquet")
    writeSource(2000)
    val first = Layout.zorderedLineitem(spark, base, nFiles = 4)
    assert(fs.exists(new Path(first, "_SUCCESS")))
    // unchanged source → exact reuse (same path, no rewrite)
    assert(Layout.zorderedLineitem(spark, base, nFiles = 4) === first)
    writeSource(3000) // mutate the source in place (same dir string)
    val second = Layout.zorderedLineitem(spark, base, nFiles = 4)
    assert(second !== first,
      "mutated source reused the stale z-order layout — contentKey is not " +
        "part of the _SUCCESS cache key")
    assert(spark.read.parquet(second).count() === 3000)
    fs.delete(srcDir, true)
    Seq(first, second).foreach(p => fs.delete(new Path(p), true))
  }

  test("JSONL round trip is byte-exact on hostile strings (escapes, unicode)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslash \\\" mixed"),
      (3L, "newline\nand\ttab\rand\fcontrolchars"),
      (4L, "unicode: café 中文 😀 ß"),
      (5L, "{\"looks\":\"like json\",\"n\":[1,2]}"),
      (6L, ""),
      (7L, "trailing backslash \\"))
      .toDF("doc_id", "text")
    val out = "target/jsonl/spec_nasty"
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    nasty.write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = spark.read.schema(schema).json(out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    nasty.collect().foreach { r =>
      assert(back(r.getLong(0)) === r.getString(1),
        s"doc ${r.getLong(0)} mutated in the JSONL round trip")
    }
    fs.delete(new Path(out), true)
  }

  test("ORC round trip is byte-exact on hostile strings (escapes, unicode)") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslash \\\" mixed"),
      (3L, "newline\nand\ttab\rand\fcontrolchars"),
      (4L, "unicode: café 中文 😀 ß"),
      (5L, "{\"looks\":\"like json\",\"n\":[1,2]}"),
      (6L, ""),
      (7L, "trailing backslash \\"))
      .toDF("doc_id", "text")
    val out = "target/orc/spec_nasty"
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    nasty.write.mode("overwrite").orc(out)
    // no schema declaration: ORC carries it in the footer
    val back = spark.read.orc(out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    nasty.collect().foreach { r =>
      assert(back(r.getLong(0)) === r.getString(1),
        s"doc ${r.getLong(0)} mutated in the ORC round trip")
    }
    fs.delete(new Path(out), true)
  }

  test("q128 matches the parquet originals and pushes the lang filter into ORC") {
    val df = SparkEntry.queries("q128_orc_roundtrip")(spark, sf)
    val viaOrc = df.collect().map(r => (r.getLong(0), r.getString(4))).toMap
    val direct = Tables.documents(spark, sf)
      .filter(col("lang").isin("en", "zh"))
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaOrc === direct)
    assert(viaOrc.nonEmpty)
    // the lang predicate must reach the ORC scan, not run as a post-filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(lang"),
      s"lang filter not pushed into the ORC scan:\n$plan")
  }

  test("ORC scans prune columns: a narrow projection never reads text") {
    val path = Layout.orcDocuments(spark, sf)
    val narrow = spark.read.orc(path).select("doc_id", "lang")
    val scan = narrow.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"narrow ORC projection still reads more than (doc_id, lang):\n$scan")
    assert(narrow.count() === Tables.documents(spark, sf).count())
  }

  test("q120 reads the staged JSONL schema-first and matches the parquet md5s") {
    val out = SparkEntry.queries("q120_jsonl_roundtrip")(spark, sf)
    val viaJson = out.collect().map(r => (r.getLong(0), r.getString(4))).toMap
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaJson === direct)
    // schema-first: the plan must not have paid an inference pass — the
    // reader's schema is exactly the declared one
    assert(out.schema.fieldNames.toSeq ===
      Seq("doc_id", "lang", "source", "n_chars", "text_md5"))
  }

  test("q153 reads the staged Avro schema-first and matches the " +
    "parquet md5s") {
    val out = SparkEntry.queries("q153_avro_roundtrip")(spark, sf)
    val viaAvro = out.collect().map(r => (r.getLong(0), r.getString(4))).toMap
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaAvro === direct)
    assert(viaAvro.nonEmpty)
    assert(out.schema.fieldNames.toSeq ===
      Seq("doc_id", "lang", "source", "n_chars", "text_md5"))
  }

  test("avro interchange: reader-schema projection decodes a column " +
    "subset, and nulls/binary survive the round trip") {
    import org.apache.spark.sql.types._
    import graft.sources.AvroInterchange
    // null + binary round trip on a hand-built frame
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("b", BinaryType), StructField("d", DoubleType)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "a", Array[Byte](1, 2, 3), 0.5),
      org.apache.spark.sql.Row(2L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = s"target/avro/spec_rt_${System.nanoTime()}"
    AvroInterchange.write(df, tmp)
    val back = AvroInterchange.read(spark, tmp, schema)
      .orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getLong(0) === 1L && back(0).getString(1) === "a" &&
      back(0).getAs[Array[Byte]](2).toSeq === Seq[Byte](1, 2, 3) &&
      back(0).getDouble(3) === 0.5)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
    // schema-first projection: a narrower reader schema resolves
    // against the writer schema by field NAME (unused columns never
    // decoded into rows)
    val narrow = StructType(Seq(
      StructField("id", LongType), StructField("d", DoubleType)))
    val proj = AvroInterchange.read(spark, tmp, narrow).orderBy("id").collect()
    assert(proj.map(_.toSeq).toSeq ===
      Seq(Seq(1L, 0.5), Seq(2L, null)))
  }

  test("q142: schema-evolved segments union into one corpus with " +
    "NULL-filled pre-evolution columns") {
    import org.apache.spark.sql.functions.col
    val root = Layout.evolvedDocuments(spark, sf)
    val m = spark.read.option("mergeSchema", "true").parquet(root)
    assert(m.columns.toSet ===
      Set("doc_id", "lang", "text", "quality", "seg"))
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(m.count() === docs.count())
    // v1 rows (no quality at write time) read as NULL; v2 rows carry it
    assert(m.filter(col("seg") === "v1")
      .filter(col("quality").isNotNull).count() === 0L)
    assert(m.filter(col("seg") === "v2")
      .filter(col("quality").isNull).count() === 0L)
    // the evolved column round-trips its source signal exactly
    val v2 = m.filter(col("seg") === "v2")
      .select("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("n_chars").cast("int")).collect()
      .foreach(r => assert(v2(r.getLong(0)) === r.getInt(1)))
    // per-version audits prune to their segment directory
    val pruned = m.filter(col("seg") === "v2")
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!pruned.contains("seg=v1"))
  }
}
