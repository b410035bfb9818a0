package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container has no image/audio codecs); everything around it — the
  * schema, the per-partition batch shape, the partition-preserving
  * mapPartitions, the metadata struct — is the real Spark plumbing a
  * production decoder would drop into.
  */
object Multimodal {

  /** One multimodal record: raw bytes + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte],
                         format: String, n_bytes: Long)

  case class MediaFeatures(doc_id: Long, format: String,
                           feat: Array[Float], feat_norm: Double)

  /** Build a multimodal relation from `documents`: the text bytes
    * stand in for an encoded image/audio payload. Schema:
    * (doc_id LONG, media BINARY, format STRING, n_bytes LONG).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast(BinaryType).as("media"),
        // deterministic fake format tag derived from the id
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("wav").as("format"),
        length(col("text")).cast(LongType).as("n_bytes"))

  /** STUB decoder: a real implementation would call an image/audio
    * codec here (per partition, reusing the codec instance across the
    * partition's rows — the expensive init happens once per task, not
    * once per row). The stub emits a deterministic 8-dim "feature":
    * mean byte value of 8 equal slices of the payload, scaled to
    * [0, 1]. Replace the body marked STUB to productionize.
    */
  def decodeFeatures(media: Array[Byte]): Array[Float] = {
    // ---- STUB: deterministic fake decode (no codecs in container) ----
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
    // ---- end STUB ----
  }

  /** Feature extraction over the binary column: partition-preserving
    * mapPartitions (no shuffle), one decoder per partition. This is
    * the Scala analog of a Pandas-UDF `mapInPandas` batch stage: rows
    * stream through in partition-sized batches.
    */
  def extractFeatures(media: Dataset[MediaRecord])
                     (implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (once per task)
      it.map { r =>
        val f = decodeFeatures(r.media)
        val norm = math.sqrt(f.map(x => x.toDouble * x.toDouble).sum)
        MediaFeatures(r.doc_id, r.format, f,
          math.rint(norm * 10000) / 10000)
      }
    }
  }

  /** Resize: shrink each payload to `targetBytes` by stride-sampling
    * its bytes — the binary-plumbing shape of an image resize (a real
    * implementation swaps the sampler for a codec's scale call inside
    * the same per-partition stage; see [[decodeFeatures]] for the
    * stub convention). Codegen'd expressions only: the stride is
    * computed per row, the gather is one transform + substr chain.
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

  /** `multimodal_features` — the declared (rows-only) query: media
    * table → stub decode → per-format feature statistics. NO ORACLE
    * (binary decode is not expressible in the DuckDB harness).
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
      .orderBy("format")
  }
}
