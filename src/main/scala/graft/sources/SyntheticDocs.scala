package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-docs` — a DataSourceV2 connector generating a deterministic
  * synthetic document corpus: the batch counterpart of Spark's `rate`
  * streaming source, for exercising the corpus operators (NearDup,
  * TextSim, Sampling) at ANY scale with zero input files.
  *
  * {{{
  * spark.read.format("graft-docs")
  *   .option("numDocs", 100000).option("numPartitions", 64)
  *   .option("seed", 7).load()
  * }}}
  *
  * Engine-relevant properties, all exercised by SyntheticDocsSpec:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): a
  *    projection that drops `text` skips text generation entirely —
  *    the readers materialize only requested columns.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): range/equality
  *    predicates on `doc_id` narrow the GENERATED id range, so
  *    `WHERE doc_id >= N` costs rows-after-N, not a generate-then-drop
  *    full scan. Non-id filters stay in Spark (returned as residuals).
  *  - **Determinism under re-planning**: a document's content is a pure
  *    function of `(seed, doc_id)` — never of partitioning — so any
  *    partition count, pushed range, or retry produces identical rows
  *    (the property every replayable source needs at 100 TB; task
  *    retries regenerate bit-identical splits).
  *
  * Content model mirrors the `documents` test table (same columns and
  * types): token soup from a bounded vocabulary with a deliberate ~3%
  * exact-duplicate rate (hash-bucketed doc ids share content) so dedup
  * operators find work at every scale.
  */
class SyntheticDocs extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticDocs.DocsTable(
      new CaseInsensitiveStringMap(properties))
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "de", "fr", "es")

  /** splitmix64 — tiny, high-quality, allocation-free per-doc PRNG
    * (shared avalanche: [[graft.functions.SplitMix64]]).
    */
  private def mix(x: Long): Long =
    graft.functions.SplitMix64.avalanche(x + graft.functions.SplitMix64.Gamma)

  /** Content is a pure function of (seed, docId): ~3% of ids alias to
    * a NEARBY canonical id's content (planted exact duplicates).
    * Nearby, not global: aliasing every dup to a handful of global
    * canonicals would plant a few giant identical-content clusters,
    * whose identical minhash signatures blow up LSH band buckets
    * quadratically — real crawl dups come as many small clusters, and
    * the generator must reproduce that shape for near-dup benchmarks
    * to be honest.
    */
  private[sources] def genDoc(seed: Long, docId: Long,
                              vocab: Int, avgTokens: Int): (String, String, String) = {
    val base = mix(seed ^ docId)
    val contentId = if (java.lang.Long.remainderUnsigned(base, 32) == 0)
      docId - docId % 37 else docId // dup: alias to the 37-block canonical
    val h0 = mix(seed ^ contentId)
    val nTokens = (avgTokens / 2 + java.lang.Long.remainderUnsigned(h0, avgTokens)).toInt
    val sb = new java.lang.StringBuilder(nTokens * 5)
    var i = 0
    var h = h0
    while (i < nTokens) {
      h = mix(h)
      if (i > 0) sb.append(' ')
      sb.append('w').append(java.lang.Long.remainderUnsigned(h, vocab))
      i += 1
    }
    // lang/source keyed off the ORIGINAL id (dups can cross shards,
    // like real crawl duplicates)
    val meta = mix(seed ^ docId ^ 0x5deece66dL)
    (sb.toString,
      langs((java.lang.Long.remainderUnsigned(meta, 4)).toInt),
      "src" + java.lang.Long.remainderUnsigned(meta >>> 8, 5))
  }

  private final class DocsTable(options: CaseInsensitiveStringMap)
      extends Table with SupportsRead {
    override def name(): String = "graft-docs"
    override def schema(): StructType = SyntheticDocs.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
      new DocsScanBuilder(
        numDocs = options.getLong("numDocs", 1000L),
        numPartitions = options.getInt("numPartitions", 8),
        seed = options.getLong("seed", 42L),
        vocab = options.getInt("vocabSize", 500),
        avgTokens = options.getInt("avgTokens", 80))
  }

  private final class DocsScanBuilder(numDocs: Long, numPartitions: Int,
                                      seed: Long, vocab: Int, avgTokens: Int)
      extends ScanBuilder
      with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
    private var required: StructType = SyntheticDocs.schema
    private var lo = 0L
    private var hi = numDocs
    private var pushed: Array[Filter] = Array.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (accepted, residual) = filters.partition {
        case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
        case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
        case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
        case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
        case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
        case _ => false
      }
      accepted.foreach {
        case EqualTo(_, v) =>
          val x = v.asInstanceOf[Number].longValue()
          lo = math.max(lo, x); hi = math.min(hi, x + 1)
        case GreaterThan(_, v) =>
          lo = math.max(lo, v.asInstanceOf[Number].longValue() + 1)
        case GreaterThanOrEqual(_, v) =>
          lo = math.max(lo, v.asInstanceOf[Number].longValue())
        case LessThan(_, v) =>
          hi = math.min(hi, v.asInstanceOf[Number].longValue())
        case LessThanOrEqual(_, v) =>
          hi = math.min(hi, v.asInstanceOf[Number].longValue() + 1)
        case _ =>
      }
      pushed = accepted
      residual // Spark re-applies these; pushed ones are exact
    }

    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan =
      new DocsScan(math.min(lo, hi), hi, numPartitions, seed, vocab,
        avgTokens, required)
  }

  private final class DocsScan(lo: Long, hi: Long, numPartitions: Int,
                               seed: Long, vocab: Int, avgTokens: Int,
                               required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String =
      s"graft-docs range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val n = math.max(1, math.min(numPartitions.toLong,
        math.max(1L, hi - lo)).toInt)
      val span = hi - lo
      (0 until n).map { i =>
        DocsPartition(lo + span * i / n, lo + span * (i + 1) / n,
          seed, vocab, avgTokens,
          required.fieldNames): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      DocsReaderFactory()
  }

  private case class DocsPartition(start: Long, end: Long, seed: Long,
                                   vocab: Int, avgTokens: Int,
                                   cols: Array[String]) extends InputPartition

  private case class DocsReaderFactory() extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val dp = p.asInstanceOf[DocsPartition]
      new PartitionReader[InternalRow] {
        private var id = dp.start - 1
        private val needsText = dp.cols.exists(c =>
          c == "text" || c == "n_chars")
        override def next(): Boolean = { id += 1; id < dp.end }
        override def get(): InternalRow = {
          // text generation is skipped entirely when pruned away
          val (text, lang, source) =
            if (needsText) genDoc(dp.seed, id, dp.vocab, dp.avgTokens)
            else {
              val meta = mix(dp.seed ^ id ^ 0x5deece66dL)
              (null,
                langs((java.lang.Long.remainderUnsigned(meta, 4)).toInt),
                "src" + java.lang.Long.remainderUnsigned(meta >>> 8, 5))
            }
          InternalRow.fromSeq(dp.cols.toIndexedSeq.map {
            case "doc_id" => id
            case "text" => UTF8String.fromString(text)
            case "lang" => UTF8String.fromString(lang)
            case "source" => UTF8String.fromString(source)
            case "n_chars" => text.length.toLong
          })
        }
        override def close(): Unit = ()
      }
    }
  }
}
