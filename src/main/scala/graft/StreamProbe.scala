package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming depth probe (r18 VERDICT ask #6): T1–T6 are unit-green on
  * MemoryStream, but a MemoryStream never exercises file listing,
  * archive-on-consume, checkpoint commits, or the state store under
  * real micro-batch pressure. This main drives the two
  * production-shaped streaming paths against an actual file-source
  * directory at 100k-event scale and prints wall-clock + state-store
  * metrics (recorded in NOTES_r19):
  *
  *   1. [[Pipelines.streaming2025]] — file source with archive
  *      cleanup → validated transform → idempotent per-batch parquet;
  *      files arrive in WAVES while the query runs, so discovery,
  *      archive moves and batch commits happen incrementally the way
  *      an SQS-fed drop directory behaves, not as one catch-up batch.
  *   2. [[graft.ops.TimeOps.statefulSessionize]] — the
  *      flatMapGroupsWithState path over a file stream of events,
  *      waves split mid-user-history so session state must survive
  *      across micro-batches; prints the state operator's
  *      rows/memory from the final progress.
  *
  * Usage: sbt "runMain graft.StreamProbe"
  *   SPARK_GRAFT_STREAM_WAVES (default 10), _FILES_PER_WAVE (default
  *   100), _ROWS_PER_FILE (default 100) → 100k rows over 1000 files.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val waves = sys.env.getOrElse("SPARK_GRAFT_STREAM_WAVES", "10").toInt
    val filesPerWave =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES_PER_WAVE", "100").toInt
    val rowsPerFile =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS_PER_FILE", "100").toInt
    // r20: probe the maxFilesPerTrigger amortization curve — same
    // waves, capped batch size (None = consume all available)
    val maxFiles =
      sys.env.get("SPARK_GRAFT_STREAM_MAXFILES").map(_.toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamprobe").toString
    val totalRows = waves.toLong * filesPerWave * rowsPerFile

    def writeWave(dir: String, wave: Int, mk: Int => DataFrame): Unit =
      // one parquet file per (wave, slot): a real drop-directory
      // delivers many small files, and listing cost is the point
      (0 until filesPerWave).foreach { slot =>
        mk(wave * filesPerWave + slot).coalesce(1)
          .write.mode("append").parquet(dir)
      }

    // r20: SPARK_GRAFT_STREAM_PROBE=1|2 runs a single probe (the
    // maxFilesPerTrigger curve re-runs probe 1 at several settings —
    // no need to pay the stateful probe each time); unset = both.
    val which = sys.env.get("SPARK_GRAFT_STREAM_PROBE")
    // ---- probe 1: streaming2025 (file source + archive + foreachBatch)
    if (which.forall(_ == "1")) {
      val in = s"$root/users_in"; val outDir = s"$root/users_out"
      val ck = s"$root/users_ck"; val arch = s"$root/users_arch"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      def usersFile(fileId: Int): DataFrame =
        spark.range(rowsPerFile).select(
          concat(lit(s"user_${fileId}_"), col("id")).as("name"),
          // ~5% invalid ages so the validation filter has work
          when(col("id") % 20 === 0, lit("not-a-number"))
            .otherwise((col("id") % 90).cast("string")).as("age"),
          concat(lit("u"), col("id"), lit(s"_$fileId@example.com"))
            .as("email"))
      // r20: SPARK_GRAFT_STREAM_PREWRITE=true lands the WHOLE backlog
      // before the query starts — the catch-up regime, the only one
      // where maxFilesPerTrigger actually controls batch size (in the
      // steady-drip regime below, batch size tracks the arrival rate
      // and the cap barely binds: ~310-345 batches at EVERY setting)
      val prewrite =
        sys.env.get("SPARK_GRAFT_STREAM_PREWRITE").exists(_ == "true")
      if (prewrite) (0 until waves).foreach(writeWave(in, _, usersFile))
      val t0 = System.nanoTime()
      val q = Pipelines.streaming2025(spark, in, outDir, ck, arch,
        maxFiles).start()
      var batches = 0
      if (prewrite) q.processAllAvailable()
      else (0 until waves).foreach { w =>
        writeWave(in, w, usersFile)
        q.processAllAvailable()
      }
      // recentProgress is RING-BUFFERED (default 100 entries), so
      // counting it SATURATES on long runs — batchId is monotone
      // and survives the buffer (r20; the r19 number read 99 at
      // every setting for exactly this reason)
      batches = Option(q.lastProgress).map(_.batchId.toInt + 1)
        .getOrElse(0)
      q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val outRows = spark.read.parquet(outDir).count()
      def countFiles(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists()) 0L
        else java.nio.file.Files.walk(d.toPath).filter(f =>
          f.toString.endsWith(".parquet")).count()
      }
      println(f"stream_probe streaming2025: $totalRows rows / " +
        f"${waves * filesPerWave} files in $sec%.1f s " +
        f"(${totalRows / sec}%.0f rows/s), batches=$batches, " +
        s"maxFilesPerTrigger=${maxFiles.getOrElse(-1)}, " +
        s"out_rows=$outRows, archived_files=${countFiles(arch)}, " +
        s"unconsumed_in=${countFiles(in)}")
    }

    // ---- probe 2: statefulSessionize over a file stream ------------
    if (which.forall(_ == "2")) {
      val in = s"$root/events_in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      val nUsers = 2000
      // wave w covers ts window [w*3h, w*3h+...): every user appears in
      // every wave, so each user's session state is read+updated across
      // all `waves` micro-batches; within a wave a user gets
      // filesPerWave*rowsPerFile/nUsers events a few minutes apart,
      // with a >30min gap between waves forcing a new session per wave
      // wave period 8h vs an in-wave ts staircase that tops out at
      // ~2.8h: a user spanning two waves sees a >5h silence — far past
      // the 30-minute gap — so cross-BATCH session splits must happen,
      // which is exactly the state-store behavior the probe pins (the
      // first cut of this fixture used a 3h period, the boundary gap
      // came out ~15min, and max_session_id=1 proved only state
      // persistence, not session splitting)
      def eventsFile(fileId: Int): DataFrame = {
        val wave = fileId / filesPerWave
        spark.range(rowsPerFile).select(
          (lit(fileId.toLong * rowsPerFile) + col("id")).as("event_id"),
          timestamp_micros((lit(wave.toLong * 8 * 3600 * 1000000L) +
            (col("id") + lit((fileId % filesPerWave).toLong * rowsPerFile))
              * 1000000L)).as("ts"),
          ((col("id") + lit(fileId.toLong)) % nUsers).as("user_id"))
      }
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG")
        .parquet(in)
        .as[graft.ops.TimeOps.SessionEvent]
      val sessions = graft.ops.TimeOps.statefulSessionize(stream)
      val t0 = System.nanoTime()
      val q = sessions.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/events_ck")
        .format("memory").queryName("probe_sessions").start()
      (0 until waves).foreach { w =>
        writeWave(in, w, eventsFile)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val outRows = spark.table("probe_sessions").count()
      val maxSession = spark.table("probe_sessions")
        .agg(max("session_id")).head().getLong(0)
      // users whose session id ever advanced past 1 — each is a
      // session split that crossed at least one micro-batch boundary
      val splitUsers = spark.table("probe_sessions")
        .filter(col("session_id") > 1).select("user_id").distinct().count()
      val stateOps = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
      q.stop()
      println(f"stream_probe statefulSessionize: $totalRows events in " +
        f"$sec%.1f s (${totalRows / sec}%.0f rows/s), out_rows=$outRows, " +
        s"max_session_id=$maxSession, users_with_splits=$splitUsers, state=" +
        stateOps.map(s => s"rows=${s.numRowsTotal} " +
          s"memBytes=${s.memoryUsedBytes}").mkString(";"))
    }
    spark.stop()
    // probe artifacts are large (100k-row parquet x2 + archives);
    // delete on the way out
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    scala.util.Using.resource(Files.walk(Paths.get(root))) { walk =>
      walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p): Unit)
    }
  }
}
