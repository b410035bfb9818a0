package graft

import java.sql.Timestamp

import graft.ops.TimeOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Structured Streaming coverage T1–T6 (SURVEY §2.10): MemoryStream
  * micro-batches through the windowed/sessionized/deduped transforms
  * the reference's SQS loop (etl_2025.py:233-263) lacks, plus the
  * foreachBatch sink and file-source ingestion loop it has.
  */
class StreamingSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def runToCompletion(events: Seq[Ev],
                              build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                              mode: String = "append"): Array[org.apache.spark.sql.Row] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    stream.addData(events)
    val name = s"sink_${System.nanoTime()}"
    val q = build(stream.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
  }

  private val sample = Seq(
    Ev(1, t("2024-01-01 00:05:00"), 1, "click", 1.0),
    Ev(2, t("2024-01-01 00:20:00"), 1, "click", 2.0),
    Ev(3, t("2024-01-01 01:10:00"), 1, "view", 3.0),
    Ev(4, t("2024-01-01 00:40:00"), 2, "click", 4.0))

  test("T3 tumbling window counts per hour bucket") {
    val rows = runToCompletion(sample,
      df => TimeOps.tumblingCounts(df), mode = "complete")
    val byKey = rows.map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byKey((t("2024-01-01 00:00:00"), "click")) == 3L)
    assert(byKey((t("2024-01-01 01:00:00"), "view")) == 1L)
  }

  test("T4 sliding window produces overlapping buckets") {
    val rows = runToCompletion(sample,
      df => TimeOps.slidingCounts(df, "1 hour", "15 minutes"),
      mode = "complete")
    // an event at 00:05 falls in sliding windows starting 23:15..00:00
    val clickWindows = rows.filter(_.getString(1) == "click")
      .map(_.getTimestamp(0)).distinct
    assert(clickWindows.length > 3,
      s"expected overlapping windows, got ${clickWindows.toSeq}")
  }

  test("T5 session window closes after the 30-minute gap") {
    val rows = runToCompletion(sample,
      df => TimeOps.sessionCounts(df, "30 minutes"), mode = "complete")
    val u1 = rows.filter(_.getLong(1) == 1L)
    // user 1: events at 00:05/00:20 merge (gap 15m), 01:10 is a new session
    assert(u1.length == 2, s"expected 2 sessions for user 1, got ${u1.toSeq}")
    assert(u1.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-static join enriches a stream against a batch dimension") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = MemoryStream[Ev]
    stream.addData(sample)
    val name = s"ssj_${System.nanoTime()}"
    val q = TimeOps.streamStaticEnrich(stream.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val tiers = spark.table(name)
      .collect().map(r => r.getLong(r.fieldIndex("event_id")) ->
        r.getString(r.fieldIndex("tier"))).toMap
    assert(tiers(1L) == "gold" && tiers(4L) == "silver")
  }

  test("stream-stream interval join matches within the delay bound only") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    clicks.addData(Seq(
      Ev(10, t("2024-01-01 00:00:00"), 1, "click", 0),
      Ev(11, t("2024-01-01 02:00:00"), 2, "click", 0)))
    buys.addData(Seq(
      Ev(20, t("2024-01-01 00:30:00"), 1, "buy", 9),  // within 1h of click 10
      Ev(21, t("2024-01-01 03:30:00"), 2, "buy", 9),  // 1.5h after click 11 -> no match
      Ev(22, t("2024-01-01 00:40:00"), 3, "buy", 9))) // no click for user 3
    val name = s"ssj2_${System.nanoTime()}"
    val q = TimeOps.streamStreamJoin(clicks.toDF(), buys.toDF())
      .writeStream.format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(r.fieldIndex("l_id")), r.getLong(r.fieldIndex("r_id"))))
    assert(rows.toSeq == Seq((10L, 20L)), s"got ${rows.toSeq}")
  }

  test("T6 dropDuplicatesWithinWatermark removes redelivered events") {
    val dup = sample ++ Seq(Ev(1, t("2024-01-01 00:05:00"), 1, "click", 1.0))
    val rows = runToCompletion(dup, df => TimeOps.dedupWithinWatermark(df))
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("T1 cleanSource archive moves consumed files (etl_2025 processed/ analog)") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft-arch-in").toString
    val archDir = java.nio.file.Files.createTempDirectory("graft-arch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-arch-ck").toString
    def parquets(d: String): Int = {
      val f = new java.io.File(d)
      if (!f.exists()) 0
      else f.listFiles().count(x => x.isFile && x.getName.endsWith(".parquet")) +
        f.listFiles().filter(_.isDirectory).map(x => parquets(x.getPath)).sum
    }
    sample.toDF().write.mode("append").parquet(inDir)
    val stream = TimeOps.fileStream(spark, inDir, sample.toDF().schema,
      archiveDir = Some(archDir))
    val name = s"arch_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    // the async cleaner archives batch N's files while processing
    // batch N+1 — feed a second file to trigger it
    sample.toDF().write.mode("append").parquet(inDir)
    q.processAllAvailable()
    // generous: the async cleaner competes for CPU on a host that
    // throttles hard at times
    val deadline = System.currentTimeMillis() + 30000
    def archived: Int = parquets(archDir)
    while (archived == 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    q.stop()
    assert(spark.table(name).count() >= sample.length)
    assert(parquets(archDir) > 0,
      s"consumed input should be archived: in=${parquets(inDir)} arch=${parquets(archDir)}")
  }

  test("T5 stateful sessionize carries session ids across micro-batches") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[TimeOps.SessionEvent]
    val name = s"sess_${System.nanoTime()}"
    val q = TimeOps.statefulSessionize(stream.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    // batch 1: two events 10 min apart -> one session
    stream.addData(Seq(
      TimeOps.SessionEvent(1, t("2024-01-01 00:00:00"), 7),
      TimeOps.SessionEvent(2, t("2024-01-01 00:10:00"), 7)))
    q.processAllAvailable()
    // batch 2: one event 5 min later (same session — state carried),
    // one event 2 hours later (new session)
    stream.addData(Seq(
      TimeOps.SessionEvent(3, t("2024-01-01 00:15:00"), 7),
      TimeOps.SessionEvent(4, t("2024-01-01 02:30:00"), 7)))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table(name)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sessions == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      s"got $sessions")
  }

  test("streaming corpus dedup drops in-horizon exact duplicates") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp, String)]
    stream.addData(Seq(
      (1L, t("2024-01-01 00:00:00"), "the quick brown fox"),
      (2L, t("2024-01-01 00:10:00"), "THE QUICK BROWN FOX  "), // dup after norm
      (3L, t("2024-01-01 00:20:00"), "an entirely different doc")))
    val name = s"sink_${System.nanoTime()}"
    val q = graft.ops.TextSim.streamDedupDocs(
        stream.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table(name).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L),
      s"expected the trim/case-normalized duplicate dropped, kept ${kept.toSeq}")
  }

  test("T1+T2 file source feeds foreachBatch sink (micro-batch ETL loop)") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sample.toDF().write.mode("append").parquet(inDir)
    val schema = sample.toDF().schema
    val stream = TimeOps.fileStream(spark, inDir, schema)
    val q = TimeOps.foreachBatchSink(stream, outDir, ckpt)(
      b => b.withColumn("event_type", upper(col("event_type")))).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$outDir/batch_id=0")
    assert(out.count() == sample.length)
    assert(out.filter(col("event_type") === "CLICK").count() == 3)
  }

  test("T2 kill-and-restart from checkpoint: replayed batch re-commits " +
      "idempotently (effectively-once)") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft-rs-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rs-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rs-ck").toString
    val schema = sample.toDF().schema
    def runOnce(): Unit = {
      // a just-stopped run's checkpoint lease can linger for a beat
      // (the conflict surfaces as a STREAM_FAILED "concurrently
      // using <ckpt>" on the restart); retry the whole run instead
      // of flaking
      val deadline = System.currentTimeMillis() + 30000
      var done = false
      while (!done) {
        val q = TimeOps.foreachBatchSink(
          TimeOps.fileStream(spark, inDir, schema), outDir, ckpt)(
          b => b.withColumn("event_type", upper(col("event_type")))).start()
        try {
          q.processAllAvailable()
          q.stop()
          q.awaitTermination()
          done = true
        } catch {
          case e: Exception if e.getMessage != null &&
              e.getMessage.contains("concurrently using") &&
              System.currentTimeMillis() < deadline =>
            try q.stop() catch { case _: Exception => () }
            Thread.sleep(500)
        }
      }
    }
    def batchDirs: Set[String] = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    // run 1: batch 0 commits, then the query "dies"
    sample.toDF().write.mode("append").parquet(inDir)
    runOnce()
    assert(batchDirs == Set("batch_id=0"))
    // run 2 (restart from checkpoint): only the NEW file becomes a
    // batch — the committed batch 0 is not re-read, not re-written
    val extra = Seq(Ev(5, t("2024-01-01 02:00:00"), 3, "click", 5.0),
      Ev(6, t("2024-01-01 02:10:00"), 3, "view", 6.0))
    extra.toDF().write.mode("append").parquet(inDir)
    runOnce()
    assert(batchDirs == Set("batch_id=0", "batch_id=1"))
    assert(spark.read.parquet(s"$outDir/batch_id=1").count() == 2)
    // run 3 — the at-least-once case: crash AFTER the sink wrote
    // batch 1 but BEFORE the checkpoint recorded the commit.
    // Simulate by deleting the commit marker: on restart the engine
    // replays batch 1 from its logged offsets, and the per-batchId
    // overwrite absorbs the duplicate delivery
    val commit1 = new java.io.File(s"$ckpt/commits/1")
    assert(commit1.exists(), "expected a commit marker for batch 1")
    assert(commit1.delete())
    runOnce()
    assert(batchDirs == Set("batch_id=0", "batch_id=1"),
      "replay must not mint new batch dirs")
    val all = spark.read.parquet(outDir)
    assert(all.count() == sample.length + extra.length,
      "replayed commit duplicated rows")
    assert(all.select("event_id").distinct().count() ==
      sample.length + extra.length)
    // run 4: nothing new — restart is a no-op, state unchanged
    runOnce()
    assert(batchDirs == Set("batch_id=0", "batch_id=1"))
    assert(spark.read.parquet(outDir).count() ==
      sample.length + extra.length)
  }
}
