package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Fixed-cost decomposition for the bench composite (r12 VERDICT #3):
  * ~24 s of the 51.4 s sf0.1 composite was per-query FIXED cost
  * (doesn't scale with data). This main splits each query's wall time
  * into
  *   - `planMs`: wall time of building the DataFrame and forcing
  *     `executedPlan` — Catalyst analysis/optimization/planning PLUS
  *     any eager helper jobs the query builder runs (collected
  *     brackets, order statistics); forced BEFORE the write so the
  *     write phase times only execution,
  *   - `execMs`: the noop write (job scheduling + task run),
  * and counts jobs/tasks during the write — the three candidate
  * explanations for 0.165 s/query (heavy plans, many eager jobs, many
  * tiny tasks). Run on sf0.001 where data cost is negligible, the
  * numbers are ~pure fixed cost; the breakdown goes to BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileFixed"
  * (optional SPARK_GRAFT_ONLY=a,b; same bench session config).
  */
object ProfileFixed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // job/task counters; volatile is enough — listener events arrive on
    // one listener-bus thread, reads happen after waitUntilEmpty
    @volatile var jobs = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })
    // True-Catalyst accumulator (r18): the heavy "buildMs" entries are
    // EAGER builders (Lloyd collects, localCheckpoint, bloom build),
    // so buildMs conflates plan compilation with job execution. Every
    // action's QueryPlanningTracker reports the actual
    // analysis/optimization/planning wall — summing it over the
    // actions fired during a phase splits "Catalyst" from "jobs +
    // driver logic". localCheckpoint/collect/noop-write all run
    // through Dataset.withAction, which fires this listener.
    val catalystMs = new java.util.concurrent.atomic.AtomicLong
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val ms = qe.tracker.phases.values
            .map(p => p.endTimeMs - p.startTimeMs).sum
          catalystMs.addAndGet(ms): Unit
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      })
    // listenerBus.waitUntilEmpty is private[spark]; a short sleep after
    // each phase lets the async bus drain — counts are diagnostics, a
    // ±1 race on a 100-job run is immaterial. The sleeps sit OUTSIDE
    // the timed window so they never pollute the ms numbers.
    def counted[A](f: => A): (A, Int, Int, Double, Long) = {
      Thread.sleep(60)
      val (j0, t0, c0) = (jobs, tasks, catalystMs.get())
      val t = System.nanoTime()
      val r = f
      val ms = (System.nanoTime() - t) / 1e6
      Thread.sleep(60)
      (r, jobs - j0, tasks - t0, ms, catalystMs.get() - c0)
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm pass first (codegen + JIT), matching Bench's pair rule:
    // the SECOND pass's numbers are the steady-state fixed cost
    case class Rec(name: String, buildPlanMs: Double, execMs: Double,
                   buildJobs: Int, execJobs: Int, execTasks: Int,
                   catalystMs: Long)
    def one(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Rec = {
      // build + force full planning; eager helper jobs (collects inside
      // the builder, e.g. exactPercentiles) are charged here
      val (df, bj, _, buildMs, bCat) = counted {
        val d = fn(spark, sfDir)
        d.queryExecution.executedPlan // force analyze/optimize/plan
        d
      }
      // the executedPlan force above fires no action, so its tracker
      // never reaches the listener — read it directly; for eager
      // builders it is the trivial plan over the checkpointed result
      val directCat = df.queryExecution.tracker.phases.values
        .map(p => p.endTimeMs - p.startTimeMs).sum
      val (_, ej, et, execMs, eCat) = counted {
        df.write.format("noop").mode("overwrite").save()
      }
      Rec(name, buildMs, execMs, bj, ej, et, bCat + directCat + eCat)
    }
    val recs = qlist.flatMap { case (n, f) =>
      try { one(n, f); Some(one(n, f)) } // warm, then measure
      catch { case e: Throwable =>
        println(s"profile: $n FAILED: ${e.getMessage}"); None }
    }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(f"${"query"}%-28s${"buildMs"}%9s${"execMs"}%9s${"catMs"}%7s${"bJobs"}%7s${"eJobs"}%7s${"tasks"}%7s")
    recs.sortBy(r => -(r.buildPlanMs + r.execMs)).foreach { r =>
      println(f"${r.name}%-28s${num(r.buildPlanMs)}%9s${num(r.execMs)}%9s${r.catalystMs}%7d${r.buildJobs}%7d${r.execJobs}%7d${r.execTasks}%7d")
    }
    // Committed per-query job-count artifact (r18 VERDICT ask #2): the
    // table above scrolls away; the JSON below is the durable record a
    // job-count budget is graded against. Path overridable so a scratch
    // run can't clobber the committed artifact by accident.
    val outName = sys.env.getOrElse("SPARK_GRAFT_PROFILE_OUT",
      "PROFILE_FIXED_RUN.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outName),
      recs.sortBy(r => -(r.buildJobs + r.execJobs)).map { r =>
        s"""  "${r.name}": {"jobs": ${r.buildJobs + r.execJobs}, """ +
          s""""buildJobs": ${r.buildJobs}, "execJobs": ${r.execJobs}, """ +
          s""""tasks": ${r.execTasks}, "buildMs": ${num(r.buildPlanMs)}, """ +
          s""""execMs": ${num(r.execMs)}, "catalystMs": ${r.catalystMs}}"""
      }.mkString(s"""{\n "sf": "$sfDir",\n "queries": {\n""", ",\n",
        "\n }\n}\n"))
    catch { case _: Throwable => () }
    val n = recs.size.max(1)
    println(s"summary: n=$n buildMs total=${num(recs.map(_.buildPlanMs).sum)} " +
      s"(avg ${num(recs.map(_.buildPlanMs).sum / n)}) " +
      s"execMs total=${num(recs.map(_.execMs).sum)} " +
      s"(avg ${num(recs.map(_.execMs).sum / n)}) " +
      s"catalystMs total=${recs.map(_.catalystMs).sum} " +
      s"buildJobs=${recs.map(_.buildJobs).sum} execJobs=${recs.map(_.execJobs).sum} " +
      s"tasks=${recs.map(_.execTasks).sum}")
    spark.stop()
  }
}
