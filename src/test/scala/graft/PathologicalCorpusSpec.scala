package graft

import graft.ops.{NearDup, TextSim}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pathological-corpus sweep (r17): 100 TB of scraped web data WILL
  * contain null text, empty strings, whitespace-only documents,
  * single-character documents, megabyte run-on lines, and astral
  * unicode — a text operator that throws a task failure on any of
  * them takes the whole stage down at scale. Every DataFrame-first
  * corpus operator must process this corpus without throwing, return
  * deterministic results across runs, and keep its documented row
  * semantics (per-doc operators emit ≤ one row per input doc; docs
  * with no analyzable content are dropped or zeroed, never crash).
  */
class PathologicalCorpusSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus: DataFrame = Seq[(Long, String)](
    (1L, null),                        // null text
    (2L, ""),                          // empty
    (3L, "   \t\n  "),                 // whitespace-only
    (4L, "a"),                         // single char, shorter than any k
    (5L, "one"),                       // single token
    (6L, "two tokens"),                // below shingle width
    (7L, ("lorem ipsum dolor sit amet " * 2000).trim), // huge run-on doc
    (8L, "emoji 😀 and astral 🚀 content mixed with café text"),
    (9L, "duplicate pathological doc"),
    (10L, "duplicate pathological doc"), // exact dup pair
    (11L, "normal document with enough words to exercise every analyzer path here")
  ).toDF("doc_id", "text")

  private val nDocs = 11L

  /** Run an operator twice; assert no-throw, determinism, and a row
    * bound relative to the input corpus.
    */
  private def sweep(name: String, maxRows: Long)(f: DataFrame => DataFrame): Unit = {
    val a = f(corpus).collect().map(_.toString).sorted.toSeq
    val b = f(corpus).collect().map(_.toString).sorted.toSeq
    assert(a == b, s"$name: nondeterministic on the pathological corpus")
    assert(a.size <= maxRows, s"$name: ${a.size} rows > bound $maxRows")
  }

  test("per-doc analyzers survive the pathological corpus") {
    sweep("text_entropy", nDocs)(TextSim.textEntropy)
    sweep("lang_id", nDocs)(TextSim.langId)
    sweep("text_quality", nDocs)(TextSim.textQuality)
    sweep("tok_count", nDocs)(TextSim.tokCount)
    sweep("text_repetition", nDocs)(TextSim.textRepetition)
    sweep("text_normalize", nDocs)(TextSim.textNormalize)
    sweep("quality_gopher", nDocs)(TextSim.qualityGopher)
  }

  test("corpus-level analyzers survive the pathological corpus") {
    sweep("corpus_stats", 1)(TextSim.corpusStats)
    val cs = TextSim.corpusStats(corpus).collect()(0)
    assert(cs.getLong(0) == nDocs, "corpus_stats must count every doc, " +
      "including null/empty ones")
    sweep("text_logprob", nDocs)(TextSim.textLogprob)
    sweep("text_bigram_lm", nDocs)(TextSim.textBigramLm)
    sweep("text_tfidf", 3 * nDocs)(d => TextSim.textTfidf(d, 3))
  }

  test("dedup family survives the pathological corpus and finds the dup") {
    sweep("dedup_text", nDocs)(TextSim.dedupText)
    // exact dedup must collapse the duplicate pair into ONE group
    // (n_docs=2, min doc kept) and must not crash on the null-text
    // doc (sha2(null) is a null hash group, not a task failure)
    val groups = TextSim.dedupText(corpus).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc")))
    assert(groups.contains((2L, 9L)),
      s"duplicate pair not collapsed: ${groups.toSeq.sorted}")
    sweep("simhash", nDocs)(d => NearDup.simhash(spark, d))
    sweep("simhash_portable", nDocs)(d => NearDup.simhashPortable(spark, d))
    sweep("minhash_summary", 1)(d => NearDup.dedupMinhash(spark, d,
      numHashes = 16, bands = 4, minSim = 0.4))
    sweep("winnow_portable", nDocs)(TextSim.docWinnowPortable)
    // the portable winnow drops sub-k docs (1..6 are all shorter than
    // k=12 or null) but must keep the huge and duplicate docs, and the
    // duplicate pair must agree exactly
    val ww = TextSim.docWinnowPortable(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ww.contains(7L) && ww.contains(11L))
    assert(ww(9L) == ww(10L), "identical docs must fingerprint identically")
  }

  test("huge-doc analyzer outputs stay bounded and finite") {
    val huge = corpus.filter(col("doc_id") === 7L)
    val ent = TextSim.textEntropy(huge).collect()(0)
    val rep = TextSim.textRepetition(huge).collect()(0)
    // 5-token vocabulary repeated 2000x: entropy ≈ log2(5), dup-word
    // fraction ≈ 1 — finite, in-range, and the doc must be flagged
    val entVal = ent.getAs[Double]("entropy")
    assert(entVal > 0 && entVal < 16 && !entVal.isNaN, s"entropy $entVal")
    assert(rep.getAs[Boolean]("repetitive"), "a 2000x-repeated doc must flag")
  }
}
