package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary media columns, REAL codec decode
  * (javax.imageio / javax.sound.sampled) through partition-preserving
  * mapPartitions, and frame sampling over the binary payload.
  */
class MultimodalSpec extends SparkSpec {

  test("mediaTable exposes binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(m.filter(col("n_bytes") <= 0).count() == 0)
    val formats = m.select("format").distinct()
      .collect().map(_.getString(0)).toSet
    assert(formats == Set("png", "jpeg", "wav"))
  }

  test("known 2x2 image decodes to the hand-computed feature vector") {
    // red, green, blue, white — every mean is computable by hand
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = Multimodal.decodeFeatures("png", out.toByteArray)
    assert(f(0) == 2f / 256f && f(1) == 2f / 256f)      // true decoded dims
    assert(f(2) == 0.5f && f(3) == 0.5f && f(4) == 0.5f) // channel means
    // mean luma = (.299 + .587 + .114 + 1)*255/4 = 127.5
    assert(f(5) == (127.5 / 255.0).toFloat)
    assert(f(7) == 0.5f) // green and white sit above the mean luma
    val lumas = Seq(0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0)
    val sd = math.sqrt(lumas.map(l => (l - 127.5) * (l - 127.5)).sum / 4)
    assert(math.abs(f(6) - sd / 255.0) < 1e-6)
  }

  test("known PCM decodes to the hand-computed audio features") {
    // 4 samples: 0, 16384, -16384, 32767 (16-bit LE mono 8 kHz)
    val samples = Seq(0, 16384, -16384, 32767)
    val pcm = samples.flatMap(s =>
      Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)).toArray
    val afmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), afmt, 4L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val f = Multimodal.decodeFeatures("wav", out.toByteArray)
    assert(f(0) == 4f / 4096f)                               // sample count
    assert(f(1) == ((16384 + 16384 + 32767) / 4.0 / 32768.0).toFloat)
    assert(f(3) == 2f / 3f)        // sign changes at i=2 and i=3
    assert(f(4) == (32767 / 32768.0).toFloat)                // peak
    assert(f(5) == (8000 / 48000.0).toFloat && f(6) == 0.125f)
  }

  test("non-16-bit WAVs are canonicalized before parsing, not misread") {
    // the same 4 samples written as an 8-bit UNSIGNED WAV: the decoder
    // must convert to 16-bit signed LE before the byte-pair parse —
    // misreading 8-bit bytes as 16-bit pairs would halve the sample
    // count and produce garbage amplitudes
    val samples8 = Seq(128, 192, 64, 255) // unsigned 8-bit ≈ 0, +50%, -50%, max
    val pcm8 = samples8.map(_.toByte).toArray
    val afmt8 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais8 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), afmt8, 4L)
    val out8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais8, javax.sound.sampled.AudioFileFormat.Type.WAVE, out8)
    val f = Multimodal.decodeFeatures("wav", out8.toByteArray)
    assert(f(0) == 4f / 4096f, "4 samples must survive conversion")
    // 8-bit 192 converts to 16-bit (192-128)<<8 = +16384 → |s|/32768 ≈ 0.5
    assert(math.abs(f(4) - (127 << 8) / 32768.0) < 0.01,
      s"peak must be ~max after widening, got ${f(4)}")
    assert(f(3) > 0f, "sign changes must be visible after widening")
    assert(f(5) == (8000 / 48000.0).toFloat && f(6) == 0.125f)
  }

  test("mediaTable payloads are real encodings, decoded for real") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRecord]
    val feats = Multimodal.extractFeatures(media).toDF()
      .withColumn("f0", element_at(col("feat"), 1))
      .withColumn("f1", element_at(col("feat"), 2))
    // every image row must carry the true 8x8 decoded dims in f0/f1 —
    // the byte-slice fallback (mean byte of a slice) could not produce
    // exactly 8/256 on both dims across every row
    val d = 8f / 256f
    val badImg = feats.filter(col("format").isin("png", "jpeg") &&
      (col("f0") =!= d || col("f1") =!= d)).count()
    assert(badImg == 0)
    // every wav row decoded with the true 8 kHz rate in f5
    val badWav = feats.filter(col("format") === "wav" &&
      element_at(col("feat"), 6) =!= (8000f / 48000f)).count()
    assert(badWav == 0)
  }

  test("extractFeatures keeps one row per record, fixed feature width") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRecord]
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val widths = feats.toDF().select(size(col("feat")).as("w"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(widths == Seq(8))
    // norms are deterministic: two runs agree exactly
    val a = feats.select("doc_id", "feat_norm").collect().toSeq
    val b = Multimodal.extractFeatures(media)
      .select("doc_id", "feat_norm").collect().toSeq
    assert(a == b)
  }

  test("resize shrinks large payloads to ~target and keeps small ones") {
    val target = 64
    val resized = Multimodal.resize(Multimodal.mediaTable(spark, sf), target)
    // payloads over target shrink to at most target sampled bytes
    val tooBig = resized.filter(col("n_bytes") > target &&
      col("n_bytes_resized") > target).count()
    assert(tooBig == 0)
    // payloads at or under target pass through untouched
    val mangledSmall = resized.filter(col("n_bytes") <= target &&
      col("media_resized") =!= col("media")).count()
    assert(mangledSmall == 0)
    // deterministic
    val a = resized.select("doc_id", "n_bytes_resized").collect().toSeq
    val b = Multimodal.resize(Multimodal.mediaTable(spark, sf), target)
      .select("doc_id", "n_bytes_resized").collect().toSeq
    assert(a == b)
  }

  test("frameSample emits stride-spaced fixed-size windows") {
    val frames = Multimodal.frameSample(
      Multimodal.mediaTable(spark, sf), frameBytes = 16, stride = 64)
    assert(frames.filter(length(col("frame_bytes")) > 16).count() == 0)
    // a doc with n_bytes >= 129 must produce at least 2 frames
    val big = Multimodal.mediaTable(spark, sf)
      .filter(col("n_bytes") >= 129).select("doc_id")
    val counted = frames.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val tooFew = big.join(counted, "doc_id")
      .filter(col("n_frames") < 2).count()
    assert(tooFew == 0)
  }

  test("meta twin recovers the closed-form header fields from the real bytes") {
    val rows = Multimodal.multimodalMetaPortable(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val fmt = r.getString(r.fieldIndex("format"))
      assert(r.getBoolean(r.fieldIndex("magic_ok")),
        s"doc $id ($fmt): container magic failed")
      fmt match {
        case "png" =>
          assert(r.getLong(r.fieldIndex("hdr_w")) == 8L &&
            r.getLong(r.fieldIndex("hdr_h")) == 8L)
          assert(r.isNullAt(r.fieldIndex("sample_rate")))
        case "jpeg" =>
          assert(r.isNullAt(r.fieldIndex("hdr_w")) &&
            r.isNullAt(r.fieldIndex("payload_bytes")))
        case "wav" =>
          assert(r.getLong(r.fieldIndex("sample_rate")) == 8000L)
          assert(r.getLong(r.fieldIndex("payload_bytes")) ==
            2L * (64 + id % 64), s"doc $id: wrong data-chunk size")
          // javax writes the canonical 44-byte RIFF/PCM header
          assert(r.getLong(r.fieldIndex("container_bytes")) == 44L)
      }
    }
    // the parse is pure expression work on the binary column — the
    // ONLY exchange allowed is the doc_id round-robin re-spread that
    // parallelizes the codec stage (8 bytes/row); the header parse
    // itself must not shuffle
    val plan = Multimodal.multimodalMetaPortable(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1 && plan.contains("RoundRobinPartitioning"),
      s"expected exactly the round-robin re-spread, got:\n$plan")
  }
}
