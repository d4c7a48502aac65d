package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal binary-column plumbing tests: schema, batch feature
  * extraction determinism, frame sampling arithmetic. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("payloads expose binary + typed metadata with exact byte counts") {
    val p = Multimodal.payloads(Tables.documents(spark, sf))
    assert(p.schema("payload").dataType.typeName === "binary")
    assert(p.schema("meta").dataType.typeName === "struct")
    val bad = p.filter(length(col("payload")) =!= col("meta.nbytes")).count()
    assert(bad === 0L)
  }

  test("feature extraction is deterministic, batch-shaped, fixed-dim") {
    val p = Multimodal.payloads(Tables.documents(spark, sf).limit(50))
    val f1 = Multimodal.extractFeatures(p, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(p, dim = 8).collect().sortBy(_.doc_id)
    assert(f1.length === 50)
    assert(f1.forall(_.feature.length === 8))
    // determinism across runs (and hence across executors/retries)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.checksum === b.checksum)
      assert(a.feature.toSeq === b.feature.toSeq)
    }
    // different payloads -> different checksums (stub is content-sensitive)
    assert(f1.map(_.checksum).distinct.length === 50)
  }

  test("extractFeatures decodes a real PNG to pixel statistics via ImageIO") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 2) img.setRGB(x, y, 0x204060)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val bytes = baos.toByteArray
    val feat = Multimodal.extractFeatures(Seq((1L, bytes)).toDF("doc_id", "payload"), dim = 8)
      .collect().head
    assert(feat.nbytes === bytes.length)
    assert(feat.feature(0) === 4f) // width
    assert(feat.feature(1) === 2f) // height
    assert(feat.feature(2) === 0x20.toFloat) // mean R of the solid fill
    assert(feat.feature(3) === 0x40.toFloat) // mean G
    assert(feat.feature(4) === 0x60.toFloat) // mean B
    // non-image payloads still take the deterministic stub path
    val stub = Multimodal.extractFeatures(
      Seq((2L, "plain text".getBytes("UTF-8"))).toDF("doc_id", "payload"), dim = 8)
      .collect().head
    assert(stub.feature.length === 8)
  }

  test("resizeImages bilinearly resizes a real PNG, passes non-images through") {
    import spark.implicits._
    // 8x4 solid color -> 4x2; solid fill survives any interpolation exactly
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 4) img.setRGB(x, y, 0x204060)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val txt = "not an image".getBytes("UTF-8")
    val out = Multimodal.resizeImages(
        Seq((1L, png), (2L, txt)).toDF("doc_id", "payload"), w = 4, h = 2)
      .collect().sortBy(_.doc_id)
    assert(out(0).resized)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0).payload))
    assert(back.getWidth === 4 && back.getHeight === 2)
    for (x <- 0 until 4; y <- 0 until 2)
      assert((back.getRGB(x, y) & 0xFFFFFF) === 0x204060)
    // determinism: PNG re-encode of the same input is byte-identical
    val again = Multimodal.resizeImages(
        Seq((1L, png)).toDF("doc_id", "payload"), w = 4, h = 2).collect().head
    assert(again.payload.toSeq === out(0).payload.toSeq)
    // non-image passthrough, untouched bytes
    assert(!out(1).resized)
    assert(out(1).payload.toSeq === txt.toSeq)
    assert(out(1).in_bytes === out(1).out_bytes)
  }

  test("sampleFrames yields zero frames for an empty payload") {
    import spark.implicits._
    val p = Multimodal.payloads(Seq((1L, ""), (2L, "x")).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(p, frameBytes = 64, stride = 1).collect()
    // doc 1 (0 bytes) must emit NO frames — not the two phantom frames a
    // descending sequence(0,-1) would produce; doc 2 emits exactly one
    assert(frames.count(_.getAs[Long]("doc_id") == 1L) === 0)
    assert(frames.count(_.getAs[Long]("doc_id") == 2L) === 1)
  }

  test("frame sampling covers the payload exactly with the declared stride") {
    val p = Multimodal.payloads(Tables.documents(spark, sf).limit(20))
    val frames = Multimodal.sampleFrames(p, frameBytes = 64, stride = 1)
    // re-assembling all frames must reproduce payload length
    val recon = frames.groupBy("doc_id")
      .agg(sum(length(col("frame"))).as("total"), count(lit(1)).as("n"))
      .join(p.select(col("doc_id"), col("meta.nbytes").as("nbytes")), "doc_id")
    assert(recon.filter(col("total") =!= col("nbytes")).count() === 0)
    // stride 2 keeps the even-indexed frames only
    val strided = Multimodal.sampleFrames(p, frameBytes = 64, stride = 2)
    assert(strided.filter(col("frame_idx") % 2 =!= 0).count() === 0)
  }
}
