package graft

import java.io.{FileInputStream, InputStream}
import java.util.Properties

/** Engine configuration — the analog of the reference's YAML config
  * (`/root/reference/config.yaml`, loaded at `src/etl_2025.py:32-44`:
  * aws region/bucket/queue, database host/pool size, batch size /
  * max workers). Java-properties format (stdlib; no extra deps), same
  * keys namespaced with dots; anything unset falls back to the
  * reference's defaults.
  */
final case class EngineConfig(
    s3Bucket: String,
    sqsQueue: String,
    awsRegion: String,
    dbHost: String,
    dbPort: Int,
    dbName: String,
    dbPoolSize: Int,
    batchSize: Int,
    maxWorkers: Int,
    metricsPort: Int)

object EngineConfig {

  val default: EngineConfig = EngineConfig(
    s3Bucket = "etl-data-bucket",
    sqsQueue = "etl-file-queue",
    awsRegion = "us-east-1",
    dbHost = "localhost",
    dbPort = 3306,
    dbName = "etl_db",
    dbPoolSize = 10,
    batchSize = 1000,
    maxWorkers = 4,
    metricsPort = 8000)

  def fromProperties(p: Properties): EngineConfig = {
    def s(k: String, d: String) = Option(p.getProperty(k)).getOrElse(d)
    def i(k: String, d: Int) = Option(p.getProperty(k)).map(_.trim.toInt)
      .getOrElse(d)
    EngineConfig(
      s3Bucket = s("aws.s3_bucket", default.s3Bucket),
      sqsQueue = s("aws.sqs_queue", default.sqsQueue),
      awsRegion = s("aws.region", default.awsRegion),
      dbHost = s("database.host", default.dbHost),
      dbPort = i("database.port", default.dbPort),
      dbName = s("database.database", default.dbName),
      dbPoolSize = i("database.pool_size", default.dbPoolSize),
      batchSize = i("etl.batch_size", default.batchSize),
      maxWorkers = i("etl.max_workers", default.maxWorkers),
      metricsPort = i("monitoring.prometheus_port", default.metricsPort))
  }

  def load(path: String): EngineConfig = {
    val in = new FileInputStream(path)
    try load(in) finally in.close()
  }

  def load(in: InputStream): EngineConfig = {
    val p = new Properties()
    p.load(in)
    fromProperties(p)
  }
}
