package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.DoubleAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Operational metrics — the engine analog of the reference's
  * Prometheus counters/histograms (`/root/reference/src/etl_2025.py:
  * 27-29,169,181`: processed-records counter, processing-seconds
  * histogram, errors counter) and ETLMetrics (`src/etl_2020.py:20-34`).
  *
  * A QueryExecutionListener rides every action on the session: query
  * count, cumulative duration, failure count, plus every named
  * `observe()` metric (see [[Quality.observed]]) keyed by observation
  * name. Zero extra scans — observed metrics are executor-side
  * accumulators the job already carries. Export by scraping
  * [[MetricsListener.snapshot]] from any reporter (the Prometheus
  * HTTP server of the reference maps to Spark's metrics servlet on a
  * real cluster).
  */
final class MetricsListener extends QueryExecutionListener {

  // DoubleAdder, not LongAdder: observed metrics can be fractional
  // (e.g. avg_quality in [0, 1] — longValue() would truncate them to
  // 0); counts stay exact as doubles up to 2^53.
  private val counters = new ConcurrentHashMap[String, DoubleAdder]()

  private def add(key: String, v: Double): Unit =
    counters.computeIfAbsent(key, _ => new DoubleAdder()).add(v)

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    add("queries_total", 1.0)
    add("query_duration_ms_sum", durationNs / 1e6)
    qe.observedMetrics.foreach { case (obsName, row) =>
      row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
        row.get(i) match {
          case n: Number => add(s"observed.$obsName.$f", n.doubleValue())
          case _ => // non-numeric observed metric — skip
        }
      }
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    add("errors_total", 1.0)

  /** Point-in-time view of all counters. */
  def snapshot: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    counters.forEach((k, v) => b += k -> v.sum())
    b.result()
  }
}

object Metrics {
  /** Install a listener on the session; returns it for scraping. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  /** Serve a listener's [[MetricsListener.snapshot]] in Prometheus
    * text exposition format (text/plain; version=0.0.4) on
    * `http://<host>:<port>/metrics` — the engine analog of the
    * reference's `start_http_server(9090)`
    * (`/root/reference/src/etl_2025.py:268`). Pure-JDK
    * `com.sun.net.httpserver`, no new dependencies; port 0 binds an
    * ephemeral port (tests). Metric names are sanitized to the
    * Prometheus charset ([a-zA-Z0-9_:]) and prefixed `graft_`.
    * Binds loopback by default — the endpoint has no auth, so
    * exposing it beyond the host is an explicit choice: pass the
    * interface (e.g. `"0.0.0.0"` behind a scrape-only network) as
    * `host`. Returns the server; call [[stopMetricsServer]] (or
    * `.stop(0)`) to release the port.
    */
  def serveMetrics(listener: MetricsListener, port: Int = 9090,
                   host: String = "127.0.0.1")
      : com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(host, port), 0)
    server.createContext("/metrics",
      new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          // two raw keys may sanitize to the same metric name; a
          // duplicate name makes Prometheus reject the WHOLE scrape,
          // so collisions get a stable per-key hash suffix instead
          val snap = listener.snapshot.toSeq.sortBy(_._1)
          val sanitized = snap.map { case (k, _) =>
            "graft_" + k.replaceAll("[^a-zA-Z0-9_:]", "_") }
          val counts = sanitized.groupBy(identity).view.mapValues(_.size)
          val body = snap.zip(sanitized)
            .map { case ((k, v), base) =>
              val name = if (counts(base) > 1)
                f"${base}_${k.hashCode & 0xffffff}%06x" else base
              s"# TYPE $name counter\n$name $v"
            }.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body) finally os.close()
        }
      })
    server.start()
    server
  }

  def stopMetricsServer(server: com.sun.net.httpserver.HttpServer): Unit =
    server.stop(0)
}
