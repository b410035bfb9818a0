package graft

import graft.ops.Multimodal

/** Property grid for the multimodal decode contract (r16 VERDICT:
  * `multimodal_features` was the weakest verification link after
  * doc_winnow — known-media units only). Sweeps size × format ×
  * channel count × bit depth with ANALYTICALLY KNOWN inputs, so every
  * asserted value is derived on paper, not by re-running the decoder:
  *
  *  - images: every (side, format) cell must emit exactly 8 features
  *    in [0, 1] with the documented dimension encoding; PNG (lossless)
  *    must reproduce hand-recounted channel means bit-near-exactly,
  *    JPEG (lossy) within codec tolerance;
  *  - audio: constant and alternating waveforms across
  *    channels × bit depth × sample rate have closed-form mean/rms/
  *    zero-crossing/max features, and non-16-bit inputs must land on
  *    them only if the canonicalization (8→16 widening, 24→16
  *    narrowing, stereo interleave) is correct;
  *  - corrupt/unknown payloads must take the byteSliceFeatures
  *    fallback, which itself has a closed form.
  */
class MultimodalGridSpec extends SparkSpec {

  private def inUnit(f: Array[Float], tag: String): Unit = {
    assert(f.length == 8, s"$tag: feature width ${f.length} != 8")
    f.zipWithIndex.foreach { case (v, i) =>
      assert(v >= 0f && v <= 1f, s"$tag: dim $i = $v outside [0,1]")
    }
  }

  // ---- image grid -------------------------------------------------

  test("image grid: every (side, format) cell honors the contract") {
    for (side <- Seq(1, 2, 8, 16, 300); fmt <- Seq("png", "jpeg")) {
      val bytes = Multimodal.encodeImage(7L, fmt, side)
      val f = Multimodal.decodeFeatures(fmt, bytes)
      inUnit(f, s"$fmt side=$side")
      val expectedDim = (math.min(side, 256) / 256.0).toFloat
      assert(f(0) == expectedDim && f(1) == expectedDim,
        s"$fmt side=$side: dims (${f(0)}, ${f(1)}) != $expectedDim")
    }
  }

  test("PNG means equal a hand recount of the synthesized pixels") {
    for (side <- Seq(2, 8, 16)) {
      val bytes = Multimodal.encodeImage(11L, "png", side)
      val f = Multimodal.decodeFeatures("png", bytes)
      // recount straight from the deterministic source pixels (the
      // same setRGB values encodeImage wrote; PNG is lossless)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val n = side * side
      var sr = 0L; var sg = 0L; var sb = 0L
      for (i <- 0 until n) {
        val rgb = img.getRGB(i % side, i / side)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
      }
      assert(math.abs(f(2) - sr.toDouble / n / 255.0) < 1e-6, s"R side=$side")
      assert(math.abs(f(3) - sg.toDouble / n / 255.0) < 1e-6, s"G side=$side")
      assert(math.abs(f(4) - sb.toDouble / n / 255.0) < 1e-6, s"B side=$side")
    }
  }

  test("JPEG means stay within lossy-codec tolerance of the source") {
    val side = 16
    val bytes = Multimodal.encodeImage(13L, "jpeg", side)
    val f = Multimodal.decodeFeatures("jpeg", bytes)
    // the synthesized pixels are uniform pseudo-random: channel means
    // concentrate near 0.5 and JPEG must not move them far
    Seq(2, 3, 4).foreach { d =>
      assert(math.abs(f(d) - 0.5) < 0.1,
        s"jpeg mean dim $d = ${f(d)} too far from source")
    }
  }

  // ---- audio grid -------------------------------------------------

  /** Write `samples` (16-bit signed range) as a WAV at the requested
    * bit depth / channel count / rate; each logical sample is
    * replicated across channels. 8-bit WAVs are unsigned (the WAV
    * convention), 16/24-bit signed little-endian.
    */
  private def wav(samples: Seq[Int], bits: Int, channels: Int,
                  rate: Float): Array[Byte] = {
    val enc =
      if (bits == 8) javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      else javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    val bytesPer = bits / 8
    val frame = bytesPer * channels
    val pcm = new Array[Byte](samples.length * frame)
    samples.zipWithIndex.foreach { case (s16, i) =>
      for (c <- 0 until channels) {
        val off = i * frame + c * bytesPer
        bits match {
          case 8 => // unsigned, mid 128: top byte of (s16 + 32768)
            pcm(off) = (((s16 + 32768) >> 8) & 0xFF).toByte
          case 16 =>
            pcm(off) = (s16 & 0xFF).toByte
            pcm(off + 1) = ((s16 >> 8) & 0xFF).toByte
          case 24 => // s16 << 8, little-endian 3 bytes
            val s24 = s16 << 8
            pcm(off) = (s24 & 0xFF).toByte
            pcm(off + 1) = ((s24 >> 8) & 0xFF).toByte
            pcm(off + 2) = ((s24 >> 16) & 0xFF).toByte
        }
      }
    }
    val afmt = new javax.sound.sampled.AudioFormat(
      enc, rate, bits, channels, frame, rate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), afmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio grid: constant waveform has closed-form features at " +
    "every (bits, channels, rate) cell") {
    val amp = 16384 // +0.5 full scale, exactly representable at 8 bits
    for (bits <- Seq(8, 16, 24); channels <- Seq(1, 2);
         rate <- Seq(8000f, 44100f, 96000f)) {
      val tag = s"bits=$bits ch=$channels rate=$rate"
      val f = Multimodal.decodeFeatures("wav",
        wav(Seq.fill(32)(amp), bits, channels, rate))
      inUnit(f, tag)
      val n = 32 * channels // canonical 16-bit sample count
      assert(f(0) == (math.min(n, 4096) / 4096.0).toFloat, s"$tag: count")
      // constant +0.5: mean|s| = rms = max = 0.5, zero crossings = 0
      assert(math.abs(f(1) - 0.5) < 0.01, s"$tag: mean ${f(1)}")
      assert(math.abs(f(2) - 0.5) < 0.01, s"$tag: rms ${f(2)}")
      assert(f(3) == 0f, s"$tag: zcr ${f(3)}")
      assert(math.abs(f(4) - 0.5) < 0.01, s"$tag: max ${f(4)}")
      assert(f(5) == math.min(rate / 48000.0, 1.0).toFloat, s"$tag: rate")
      assert(f(6) == (channels / 8.0).toFloat, s"$tag: channels")
      assert(math.abs(f(7) - 0.5) < 0.01, s"$tag: first half ${f(7)}")
    }
  }

  test("audio grid: alternating waveform pins the zero-crossing rate") {
    val alt = Seq.tabulate(32)(i => if (i % 2 == 0) 16384 else -16384)
    for (bits <- Seq(8, 16, 24); channels <- Seq(1, 2)) {
      val tag = s"bits=$bits ch=$channels"
      val f = Multimodal.decodeFeatures("wav", wav(alt, bits, channels, 8000f))
      inUnit(f, tag)
      if (channels == 1) {
        // every adjacent mono pair flips sign: zcr = 1
        assert(f(3) == 1f, s"$tag: zcr ${f(3)}")
      } else {
        // stereo interleave duplicates each sample: flips at the 31
        // frame boundaries of 32 frames → 31/(64−1)
        assert(math.abs(f(3) - 31.0 / 63.0) < 1e-4, s"$tag: zcr ${f(3)}")
      }
      assert(math.abs(f(1) - 0.5) < 0.01, s"$tag: mean ${f(1)}")
    }
  }

  test("payload-size grid: short, single-sample and empty payloads") {
    // empty → all-zero vector, never a throw
    assert(Multimodal.decodeFeatures("wav", Array.emptyByteArray)
      .forall(_ == 0f))
    assert(Multimodal.decodeFeatures("png", Array.emptyByteArray)
      .forall(_ == 0f))
    // single sample: n=1, zcr 0 by definition
    val f1 = Multimodal.decodeFeatures("wav", wav(Seq(16384), 16, 1, 8000f))
    assert(f1(0) == 1f / 4096f && f1(3) == 0f)
    inUnit(f1, "single sample")
  }

  test("corrupt payloads of every format tag take the byte-slice fallback") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)
    for (fmt <- Seq("png", "jpeg", "wav", "mp4", "unknown")) {
      val f = Multimodal.decodeFeatures(fmt, junk)
      inUnit(f, s"corrupt $fmt")
      assert(f.sameElements(Multimodal.byteSliceFeatures(junk)),
        s"corrupt $fmt must take the fallback")
    }
    // the fallback itself has a closed form: mean of each 8-byte slice
    val known = Array.tabulate[Byte](16)(i => (16 * i).toByte)
    val fb = Multimodal.byteSliceFeatures(known)
    (0 until 8).foreach { i =>
      val a = (16 * (2 * i)) & 0xFF; val b = (16 * (2 * i + 1)) & 0xFF
      assert(math.abs(fb(i) - (a + b) / 2.0 / 255.0) < 1e-6, s"slice $i")
    }
  }
}
