package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Stage-level decomposition of a query's noop-write execution — the
  * drill-down behind ProfileFixed's `execMs`: at sf0.001 the bench
  * fleet's per-query wall is ~pure fixed cost, and this main says
  * whether that cost is (a) stage wall (tasks + per-stage barrier),
  * (b) driver gaps between jobs/stages (planning, codegen, commit), or
  * (c) task launch overhead (sum of task wall vs stage wall).
  *
  * For each query in SPARK_GRAFT_ONLY (default: a small canary set),
  * runs the noop write `SPARK_GRAFT_RUNS` times (default 3) and prints
  * per-stage rows for the LAST (warmest) run:
  *   stage id, name prefix, tasks, stage wall ms, sum of task run ms,
  *   sum of task deserialize ms, sum of GC ms
  * plus the job wall, the sum of stage walls, and the "driver gap" =
  * job wall − span of stages.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Sources.assertFixtureSchemas(spark, sfDir)
    Seq("lineitem", "events", "documents", "embeddings", "orders",
      "customer", "nation", "region", "part", "supplier").foreach { t =>
      try { graft.ops.Sources.table(spark, sfDir, t).count(): Unit }
      catch { case _: Throwable => () }
    }
    case class StageRec(id: Int, name: String, var tasks: Int = 0,
                        var taskRunMs: Long = 0, var deserMs: Long = 0,
                        var gcMs: Long = 0, var resultSerMs: Long = 0,
                        var schedDelayMs: Long = 0,
                        var submitMs: Long = 0, var completeMs: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val jobSpans = mutable.ListBuffer.empty[(Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          val r = stages.getOrElseUpdate(s.stageInfo.stageId,
            StageRec(s.stageInfo.stageId, s.stageInfo.name.take(40)))
          r.submitMs = s.stageInfo.submissionTime.getOrElse(0L)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.get(s.stageInfo.stageId).foreach { r =>
            r.completeMs = s.stageInfo.completionTime.getOrElse(0L)
          }
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          stages.get(t.stageId).foreach { r =>
            r.tasks += 1
            val m = t.taskMetrics
            if (m != null) {
              r.taskRunMs += m.executorRunTime
              r.deserMs += m.executorDeserializeTime
              r.gcMs += m.jvmGCTime
              r.resultSerMs += m.resultSerializationTime
              val wall = t.taskInfo.finishTime - t.taskInfo.launchTime
              r.schedDelayMs += math.max(0L,
                wall - m.executorRunTime - m.executorDeserializeTime -
                  m.resultSerializationTime)
            }
          }
        }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobSpans.synchronized { jobSpans += ((j.time, -1L)) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobSpans.synchronized {
          val i = jobSpans.lastIndexWhere(_._2 == -1L)
          if (i >= 0) jobSpans(i) = (jobSpans(i)._1, j.time)
        }
    })
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    for ((name, fn) <- qlist) {
      var lastWall = 0.0
      for (r <- 1 to runs) {
        stages.synchronized(stages.clear())
        jobSpans.synchronized(jobSpans.clear())
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        lastWall = (System.nanoTime() - t0) / 1e6
        if (r == runs) {
          Thread.sleep(150) // let the async bus drain
          val ss = stages.synchronized(stages.values.toList)
          val js = jobSpans.synchronized(jobSpans.toList)
          println(f"== $name run$r wall=${lastWall}%.1f ms jobs=${js.size}")
          js.zipWithIndex.foreach { case ((a, b), i) =>
            println(f"  job$i wall=${b - a} ms") }
          val span =
            if (ss.isEmpty) 0L
            else ss.map(_.completeMs).max - ss.map(_.submitMs).min
          val stageSum = ss.map(s => s.completeMs - s.submitMs).sum
          println(f"  stages=${ss.size} stageWallSum=$stageSum ms " +
            f"stageSpan=$span ms driverOutside=${lastWall - span}%.1f ms")
          ss.foreach { s =>
            println(f"   st${s.id}%-5d tasks=${s.tasks}%-4d " +
              f"wall=${s.completeMs - s.submitMs}%-5d " +
              f"run=${s.taskRunMs}%-5d deser=${s.deserMs}%-4d " +
              f"sched=${s.schedDelayMs}%-4d gc=${s.gcMs}%-3d ${s.name}")
          }
        }
      }
    }
    spark.stop()
  }
}
