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

  // ---- q110 perceptual image dedup ----

  private def png(w: Int, h: Int)(gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val g = gray(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("dHash: identical images at distance 0; perturbed within 3; distinct far; re-encode-stable") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16, 16)(rnd.nextInt(256))
    val a = png(16, 16)((x, y) => base(x)(y))
    val a2 = png(16, 16)((x, y) => base(x)(y)) // independent encode pass
    val perturbed = png(16, 16)((x, y) =>
      if (x == 7 && y == 7) math.min(255, base(x)(y) + 1) else base(x)(y))
    val other = {
      val r2 = new scala.util.Random(99)
      val o = Array.fill(16, 16)(r2.nextInt(256))
      png(16, 16)((x, y) => o(x)(y))
    }
    def fp(b: Array[Byte]): Long = Multimodal.dHash64(b).get
    assert(fp(a) === fp(a2)) // encoding is not part of the fingerprint
    assert(java.lang.Long.bitCount(fp(a) ^ fp(perturbed)) <= 3,
      s"perturbation moved ${java.lang.Long.bitCount(fp(a) ^ fp(perturbed))} bits")
    assert(java.lang.Long.bitCount(fp(a) ^ fp(other)) > 3)
    // non-images refuse to fingerprint on the real path
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDups finds planted image pairs via the real decode path only") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = Array.fill(16, 16)(rnd.nextInt(256))
    val imgA = png(16, 16)((x, y) => base(x)(y))
    val imgB = png(16, 16)((x, y) =>
      if (x == 3 && y == 9) math.min(255, base(x)(y) + 1) else base(x)(y))
    val far = {
      val r2 = new scala.util.Random(77)
      val o = Array.fill(16, 16)(r2.nextInt(256))
      png(16, 16)((x, y) => o(x)(y))
    }
    val rows = Seq(
      (1L, imgA, "image/png"), (2L, imgB, "image/png"),
      (3L, far, "image/png"),
      (4L, "some plain text".getBytes("UTF-8"), "text/plain"),
      (5L, "different text body".getBytes("UTF-8"), "text/plain"))
    val payloads = rows.toDF("doc_id", "payload", "mime")
      .select(col("doc_id"), col("payload"),
        struct(col("mime"), length(col("payload")).as("nbytes")).as("meta"))
    val got = Multimodal.imageNearDups(payloads, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)),
      s"expected exactly the planted pair, got $got")
    val fps = Multimodal.imageFingerprints(payloads)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(fps.count(_._3) === 3) // the three PNGs took the real path
    // stub fps are a pure function of the bytes: identical payloads
    // (e.g. byte-identical boilerplate docs) would collapse to one
    // fingerprint — exact-dup semantics, q16's contract, never a false
    // cross-modality pair (a random 64-bit word is not within Hamming 3
    // of an image's dHash)
    assert(fps.filter(!_._3).map(_._2).distinct.length === 2)
  }

  test("q110 entry: every planted pair is recovered with its exact Hamming distance") {
    val docs = Tables.documents(spark, sf)
    val got = SparkEntry.queries("q110_image_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // sf0.001 plants images on doc ids 0,20,40; (0,20) share base key 0
    assert(got.map(t => (t._1, t._2)).contains((0L, 20L)))
    got.foreach { case (a, b, d) => assert(d <= 3, s"($a,$b) at $d") }
    // the planted structure is exactly the %40-paired ids — nothing else
    got.foreach { case (a, b, _) =>
      assert(a % 20 === 0 && b % 20 === 0 && a / 40 === b / 40,
        s"unplanted pair ($a,$b)")
    }
    // determinism across runs (executor retries must agree)
    val again = SparkEntry.queries("q110_image_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === again.toSeq)
  }

  // ---- q165: real WAV decode ----

  test("decodeWav recovers the EXACT synthesized samples: energy and peak " +
      "equal the synthesis-side integer folds") {
    val key = 7L
    val wav = Multimodal.synthWav(key)
    assert(Multimodal.looksLikeWav(wav))
    // closed-form twin of synthWav's integer samples
    val f = 220.0 + 20.0 * (key % 16)
    val amp = 8000.0 + 500.0 * (key % 8)
    val samples = (0 until 400).map(i =>
      math.round(amp * math.sin(2.0 * math.Pi * f * i / 8000.0)).toInt)
    val wantSumSq = samples.map(s => s.toLong * s).sum
    val wantPeak = samples.map(math.abs).max
    val Some((ch, rate, n, sumSq, peak)) = Multimodal.decodeWav(wav)
    assert(ch == 1 && rate == 8000 && n == 400L)
    assert(sumSq === wantSumSq, "decoded energy differs from synthesis")
    assert(peak === wantPeak)
    // sine RMS sanity: sqrt(sumSq/n) ~ amp/sqrt(2) within a few percent
    val rms = math.sqrt(sumSq.toDouble / n)
    assert(math.abs(rms - amp / math.sqrt(2.0)) / (amp / math.sqrt(2.0)) < 0.05)
  }

  test("audioStats: planted rows decode for real, text rows take the " +
      "explicit non-audio path, repeats are deterministic") {
    val p = Multimodal.plantedAudioPayloads(
      graft.sources.Tables.documents(spark, sf))
    val got = Multimodal.audioStats(p).collect().sortBy(_.doc_id)
    val audio = got.filter(_.is_audio)
    assert(audio.nonEmpty)
    audio.foreach { a =>
      assert(a.doc_id % 20 == 10, s"non-planted row decoded as audio: $a")
      assert(a.channels == 1 && a.sample_rate == 8000 && a.n_samples == 400L)
      assert(a.sum_sq > 0L && a.peak_abs >= 8000 && a.peak_abs <= 11500)
    }
    got.filterNot(_.is_audio).foreach { t =>
      assert(t.doc_id % 20 != 10, s"planted row fell to the stub: $t")
      assert(t.channels == 0 && t.sample_rate == 0 && t.n_samples == 0L &&
        t.sum_sq == 0L && t.peak_abs == 0,
        s"stub fabricated audio-shaped numbers: $t")
    }
    val again = Multimodal.audioStats(p).collect().sortBy(_.doc_id)
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("corrupt RIFF bytes fall back to the non-audio row, never kill the task") {
    val junk = "RIFFxxxxWAVEgarbage-not-a-real-wave-file".getBytes("UTF-8")
    assert(Multimodal.looksLikeWav(junk))
    assert(Multimodal.decodeWav(junk).isEmpty)
  }
}
