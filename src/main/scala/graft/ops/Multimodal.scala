package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The decode step is REAL: PNG/JPEG payloads are decoded with the
  * JDK's `javax.imageio` (no external codecs needed) and WAV payloads
  * with `javax.sound.sampled`; features are computed from the decoded
  * pixels / PCM samples. Payloads that fail to decode fall back to a
  * clearly-marked byte-slice featurizer so a corrupt record degrades
  * instead of killing the task — the per-record error-isolation shape
  * a production media pipeline needs.
  */
object Multimodal {

  /** One multimodal record: raw bytes + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte],
                         format: String, n_bytes: Long)

  case class MediaFeatures(doc_id: Long, format: String,
                           feat: Array[Float], feat_norm: Double)

  // ---- deterministic payload synthesis (test-data side) ----

  /** splitmix64 — deterministic per-(doc, index) pseudo-randomness for
    * payload synthesis; retry-safe like SyntheticDocs' (seed, doc_id)
    * convention.
    */
  private def mix(a: Long, b: Long): Long =
    graft.functions.SplitMix64.avalanche(
      a * graft.functions.SplitMix64.Gamma + b)

  /** Render a deterministic `side`×`side` RGB image for a doc id and
    * encode it with the requested ImageIO writer ("png" or "jpeg").
    */
  def encodeImage(docId: Long, fmt: String, side: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < side * side) {
      img.setRGB(i % side, i / side, (mix(docId, i) & 0xFFFFFF).toInt)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** Synthesize a deterministic mono 16-bit PCM WAV (8 kHz) for a doc
    * id, written through `javax.sound.sampled` so the container is a
    * spec-correct RIFF/WAVE file.
    */
  def encodeWav(docId: Long, nSamples: Int = 64): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (mix(docId, i) & 0xFFFF).toInt - 32768 // full-range sample
      pcm(2 * i) = (s & 0xFF).toByte                 // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Build a multimodal relation from `documents`: each doc carries a
    * REAL encoded payload (PNG / JPEG / WAV round-robin by id),
    * synthesized deterministically from the doc id inside a
    * partition-preserving mapPartitions (one encoder init per task —
    * ImageIO's disk cache is disabled once per JVM below). Schema:
    * (doc_id LONG, media BINARY, format STRING, n_bytes LONG).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // re-spread before the codec stage: the encode (and the decode
    // stages fed by it) costs codec-milliseconds per row, so input
    // parallelism must come from ROWS, not from parquet split
    // count — a sub-maxPartitionBytes file otherwise serializes the
    // whole table through one task. The shuffle moves 8 bytes/row.
    // Split-gated (r22): once the scan has >= cores splits every core
    // already has codec work and the exchange is skipped.
    Sources.spreadIfNarrow(
      Sources.table(s, dir, "documents").select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in tasks
        it.map { id =>
          val fmt = (id % 3) match {
            case 0 => "png"
            case 1 => "jpeg"
            case _ => "wav"
          }
          val bytes =
            if (fmt == "wav") encodeWav(id, 64 + (id % 64).toInt)
            else encodeImage(id, fmt)
          MediaRecord(id, bytes, fmt, bytes.length.toLong)
        }
      }.toDF()
  }

  /** Fallback featurizer for payloads that fail to decode (or carry an
    * unknown format tag): mean byte value of 8 equal slices of the
    * payload, scaled to [0, 1]. Keeps corrupt records flowing with a
    * well-defined feature instead of failing the task.
    */
  def byteSliceFeatures(media: Array[Byte]): Array[Float] = {
    if (media == null || media.isEmpty) return Array.fill(8)(0f)
    val slice = math.max(media.length / 8, 1)
    (0 until 8).map { i =>
      val from = math.min(i * slice, media.length)
      val until = if (i == 7) media.length else math.min((i + 1) * slice, media.length)
      if (until <= from) 0f
      else {
        var sum = 0L
        var j = from
        while (j < until) { sum += (media(j) & 0xFF); j += 1 }
        (sum.toDouble / (until - from) / 255.0).toFloat
      }
    }.toArray
  }

  /** Image features from REAL decoded pixels (`javax.imageio`):
    * [w/256, h/256, meanR/255, meanG/255, meanB/255, meanLuma/255,
    * stddevLuma/255, fraction of pixels brighter than meanLuma].
    * All 8 dims land in [0, 1].
    */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight; val n = w * h
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    val luma = new Array[Double](n)
    var i = 0
    while (i < n) {
      val rgb = img.getRGB(i % w, i / w)
      val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
      val l = 0.299 * r + 0.587 * g + 0.114 * b
      sr += r; sg += g; sb += b; sl += l; sl2 += l * l; luma(i) = l
      i += 1
    }
    val meanL = sl / n
    val varL = math.max(sl2 / n - meanL * meanL, 0.0)
    val brighter = luma.count(_ > meanL).toDouble / n
    Array(
      (math.min(w, 256) / 256.0).toFloat, (math.min(h, 256) / 256.0).toFloat,
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
      (sb / n / 255.0).toFloat, (meanL / 255.0).toFloat,
      (math.sqrt(varL) / 255.0).toFloat, brighter.toFloat)
  }

  /** Audio features from REAL decoded PCM (`javax.sound.sampled`),
    * 16-bit little-endian samples: [min(n,4096)/4096, mean|s|/32768,
    * rms/32768, zero-crossing rate, max|s|/32768, rate/48000,
    * channels/8, mean|s| of first half / 32768]. All in [0, 1].
    */
  def audioFeatures(fmt: javax.sound.sampled.AudioFormat,
                    pcm: Array[Byte]): Array[Float] = {
    val n = pcm.length / 2
    if (n == 0) return Array.fill(8)(0f)
    val s = new Array[Int](n)
    var i = 0
    while (i < n) { // 16-bit LE signed
      s(i) = ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    var sumAbs = 0.0; var sumSq = 0.0; var maxAbs = 0.0; var zc = 0
    var firstHalfAbs = 0.0
    i = 0
    while (i < n) {
      val a = math.abs(s(i).toDouble)
      sumAbs += a; sumSq += s(i).toDouble * s(i); maxAbs = math.max(maxAbs, a)
      if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
      if (i < n / 2) firstHalfAbs += a
      i += 1
    }
    Array(
      (math.min(n, 4096) / 4096.0).toFloat,
      (sumAbs / n / 32768.0).toFloat,
      (math.sqrt(sumSq / n) / 32768.0).toFloat,
      (if (n > 1) zc.toDouble / (n - 1) else 0.0).toFloat,
      (maxAbs / 32768.0).toFloat,
      // clamped so exotic-but-valid inputs (96 kHz, >8 channels)
      // cannot push features outside the documented [0, 1] range
      math.min(fmt.getSampleRate / 48000.0, 1.0).toFloat,
      math.min(fmt.getChannels / 8.0, 1.0).toFloat,
      (if (n / 2 > 0) firstHalfAbs / (n / 2) / 32768.0 else 0.0).toFloat)
  }

  /** REAL decoder: PNG/JPEG through `javax.imageio`, WAV through
    * `javax.sound.sampled` — both pure-JDK, no external codec deps.
    * Undecodable or unknown-format payloads fall back to
    * [[byteSliceFeatures]] rather than failing the task.
    */
  def decodeFeatures(format: String, media: Array[Byte]): Array[Float] = {
    if (media == null || media.isEmpty) return Array.fill(8)(0f)
    try format match {
      case "png" | "jpeg" | "jpg" =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(media))
        if (img == null) byteSliceFeatures(media) else imageFeatures(img)
      case "wav" =>
        val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(media))
        try {
          // audioFeatures parses 16-bit signed little-endian PCM; any
          // other valid WAV (8/24-bit, big-endian, unsigned, a-law…)
          // is CONVERTED to that canonical form first — without this,
          // the byte-pair parse would silently produce garbage for
          // formats the decoder accepts. Unsupported conversions
          // throw and take the byteSliceFeatures fallback.
          val f = raw.getFormat
          val canonical = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
            f.getSampleRate, false)
          val ais =
            if (f.matches(canonical)) raw
            else javax.sound.sampled.AudioSystem
              .getAudioInputStream(canonical, raw)
          try audioFeatures(ais.getFormat, ais.readAllBytes())
          finally ais.close()
        } finally raw.close()
      case _ => byteSliceFeatures(media)
    } catch { case scala.util.control.NonFatal(_) => byteSliceFeatures(media) }
  }

  /** Feature extraction over the binary column: partition-preserving
    * mapPartitions (no shuffle), one decoder setup per partition. This
    * is the Scala analog of a Pandas-UDF `mapInPandas` batch stage:
    * rows stream through in partition-sized batches.
    */
  def extractFeatures(media: Dataset[MediaRecord])
                     (implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init (once per task, not once per row)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val f = decodeFeatures(r.format, r.media)
        val norm = math.sqrt(f.map(x => x.toDouble * x.toDouble).sum)
        MediaFeatures(r.doc_id, r.format, f,
          math.rint(norm * 10000) / 10000)
      }
    }
  }

  /** Resize: shrink each payload to `targetBytes` by stride-sampling
    * its bytes — the binary-plumbing shape of an image resize (a real
    * implementation swaps the sampler for a codec's scale call inside
    * the same per-partition stage). Codegen'd expressions only: the
    * stride is computed per row, the gather is one transform + substr
    * chain.
    */
  def resize(df: DataFrame, targetBytes: Int = 64): DataFrame =
    df.withColumn("media_resized", expr(
      // bytes stay BINARY end-to-end (substr of binary is binary,
      // concat of binaries is binary) — a string round-trip would
      // corrupt non-UTF8 payloads
      s"""CASE WHEN n_bytes <= $targetBytes THEN media ELSE
         |  aggregate(
         |    transform(sequence(0L, ${targetBytes - 1}L),
         |      i -> substr(media, CAST(i * (n_bytes div $targetBytes) + 1 AS INT), 1)),
         |    CAST('' AS BINARY), (acc, x) -> concat(acc, x))
         |END""".stripMargin))
      .withColumn("n_bytes_resized",
        length(col("media_resized")).cast(LongType))

  /** Frame/segment sampling: every `stride`-th fixed-size byte window
    * of the payload — the binary-slicing pattern a video frame sampler
    * uses, done with built-in expressions (substr on BINARY), so it
    * stays in codegen.
    */
  def frameSample(df: DataFrame, frameBytes: Int = 16,
                  stride: Int = 64): DataFrame =
    df.select(col("doc_id"), col("format"),
      posexplode(expr(
        // `div`, not `/`: SQL `/` is double division and sequence()
        // requires integral bounds
        s"transform(sequence(0L, greatest(n_bytes div $stride - 1, 0L))," +
          s" i -> substr(media, CAST(i * $stride + 1 AS INT), $frameBytes))"))
        .as(Seq("frame_idx", "frame_bytes")))

  /** Big-endian 4-byte unsigned int at 1-based byte `pos` of the
    * binary `media` column — hex() of the slice, parsed base-16.
    * Built-in expressions only (substr on BINARY stays binary), so the
    * parse is whole-stage-codegen'd.
    */
  private def beInt32(pos: Int) =
    conv(hex(expr(s"substr(media, $pos, 4)")), 16, 10).cast(LongType)

  /** Little-endian 4-byte unsigned int at 1-based byte `pos`: the four
    * single-byte slices re-concatenated in reverse, then as [[beInt32]].
    */
  private def leInt32(pos: Int) =
    conv(hex(concat((pos + 3).to(pos, -1).map(i =>
      expr(s"substr(media, $i, 1)")): _*)), 16, 10).cast(LongType)

  /** `multimodal_meta_portable` — ORACLE TWIN for the multimodal
    * binary plumbing. The payloads are REAL containers written by the
    * JDK codecs, but their header fields are closed-form in `doc_id`
    * (the synthesis is deterministic: every PNG/JPEG is 8×8 RGB, every
    * WAV is mono 16-bit 8 kHz with `64 + doc_id % 64` samples), so a
    * SQL oracle that never sees the bytes can still predict — per row —
    * what a correct encoder must have produced and a correct binary
    * parse must recover:
    *
    *  - magic/container tags (PNG signature, JPEG SOI, RIFF/WAVE/data),
    *  - PNG IHDR width/height (big-endian at offsets 17/21),
    *  - WAV fmt-chunk sample rate (little-endian at offset 25),
    *  - WAV data-chunk byte count (offset 41) = `2·(64 + doc_id % 64)`,
    *  - WAV container overhead = `length(media) − data` = the canonical
    *    44-byte RIFF/PCM header.
    *
    * The WAV offsets (fmt at 13, data tag at 37, 44-byte overhead) are
    * a deliberate pin on the CURRENT JDK `AudioSystem` writer, which
    * emits the minimal RIFF/fmt/data layout with no optional chunks.
    * That is a writer-version assumption, not a WAV-spec guarantee: a
    * future JDK that inserts a LIST/fact chunk would move the data
    * chunk and flip `magic_ok`/`container_bytes` on a still-correct
    * round-trip. If this oracle ever fails after a JDK upgrade, check
    * the emitted chunk layout first (`xxd` the first 64 bytes).
    *
    * JPEG dimensions live in entropy-coded segments at variable
    * offsets, and PNG/JPEG total sizes are compressor-dependent — those
    * stay NULL here and are covered by MultimodalGridSpec's decoded
    * checks instead. The hash-compare therefore pins the full binary
    * round-trip (synthesize → encode → BINARY column → byte-level
    * parse) for every row, which is exactly the plumbing a production
    * media pipeline needs verified; the pixel/PCM FEATURE math is
    * pinned by the closed-form property grid (rows-only by design —
    * codec decode is not expressible in the SQL oracle).
    */
  def multimodalMetaPortable(s: SparkSession, dir: String): DataFrame = {
    val wav = col("format") === "wav"
    val png = col("format") === "png"
    mediaTable(s, dir).select(
      col("doc_id"),
      col("format"),
      when(png, hex(expr("substr(media, 1, 8)")) === "89504E470D0A1A0A")
        .when(col("format") === "jpeg", hex(expr("substr(media, 1, 2)")) === "FFD8")
        .otherwise(hex(expr("substr(media, 1, 4)")) === "52494646" && // 'RIFF'
          hex(expr("substr(media, 9, 4)")) === "57415645" &&          // 'WAVE'
          hex(expr("substr(media, 37, 4)")) === "64617461")           // 'data'
        .as("magic_ok"),
      when(png, beInt32(17)).as("hdr_w"),
      when(png, beInt32(21)).as("hdr_h"),
      when(wav, leInt32(25)).as("sample_rate"),
      when(wav, leInt32(41)).as("payload_bytes"),
      when(wav, col("n_bytes") - leInt32(41)).as("container_bytes"))
  }

  /** The closed-form SQL the oracle twin is checked against — kept next
    * to the parser so the two evolve together (SparkEntry interpolates
    * it verbatim).
    */
  val MetaPortableOracleSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |  TRUE AS magic_ok,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST(8 AS BIGINT) END AS hdr_w,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST(8 AS BIGINT) END AS hdr_h,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(8000 AS BIGINT) END AS sample_rate,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(2 * (64 + doc_id % 64) AS BIGINT) END AS payload_bytes,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(44 AS BIGINT) END AS container_bytes
      |FROM documents""".stripMargin

  /** `multimodal_features` — the declared (rows-only) query: media
    * table (real encoded payloads) → real codec decode → per-format
    * feature statistics. NO ORACLE (binary decode is not expressible
    * in the DuckDB harness); determinism is asserted in unit tests.
    * The binary PLUMBING feeding it is hash-oracled per row by
    * [[multimodalMetaPortable]].
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import s.implicits._
    val media = mediaTable(s, dir).as[MediaRecord]
    extractFeatures(media).toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("feat_norm")), 4).as("avg_feat_norm"),
        round(avg(element_at(col("feat"), 1)), 4).as("avg_f0"))
  }
}
