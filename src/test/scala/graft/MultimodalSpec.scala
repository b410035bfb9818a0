package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary media columns, stubbed decode through
  * partition-preserving mapPartitions, and frame sampling over the
  * binary payload.
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
}
