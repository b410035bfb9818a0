package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

/** Concurrent use of the shared session — the engine analog of the
  * reference's process-pool era (etl_2020.py): many queries submitted
  * simultaneously against one SparkSession must return exactly the
  * serial results. Exercises the thread-safety of the library surface
  * (Sources' relation cache, function registration, plan construction)
  * on top of Spark's own concurrent-job scheduler.
  */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq("agg_group", "join_dim", "text_tokens",
    "sort_topk", "sim_search", "window_rank", "dedup_text", "src_scan")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("8 queries racing on one session return the serial results") {
    val serial = names.map(n => n -> run(n)).toMap
    val racing = Await.result(
      Future.sequence(names.map(n => Future(n -> run(n)))),
      5.minutes).toMap
    names.foreach { n =>
      assert(racing(n) == serial(n), s"$n diverged under concurrency")
    }
  }
}
