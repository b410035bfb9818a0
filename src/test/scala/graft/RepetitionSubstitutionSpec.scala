package graft

import graft.ops.TextSim
import org.apache.spark.sql.functions._

/** Pins the r11 SUBSTITUTION-SAFETY property of [[TextSim.textRepetition]]
  * (see its Scaladoc): composing the operator under a filter on a derived
  * column lets PushPredicateThroughProject substitute defining expressions
  * into the filter condition. With the r8–r10 form (free `words`/`bg`
  * projection columns) that substitution put the full
  * split+transform+array_sort expression INSIDE the fold lambda — re-run
  * per fold step by interpreted eval, O(n²·log n) per document; the 1M-doc
  * curation capstone's quality gate went from minutes to hours. The fix
  * re-binds each array as a lambda variable (`transform(array(x), v -> …)
  * [0]`) before any per-element access, and lambda bindings survive any
  * substitution.
  */
class RepetitionSubstitutionSpec extends SparkSpec {

  // the substitution under test happens in the OPTIMIZER
  // (PushPredicateThroughProject), so audit the optimized logical
  // plan — also keeps the walk AQE-independent (an executedPlan
  // collect would stop at the opaque AdaptiveSparkPlanExec wrapper)
  private def composedOptimized = {
    val docs = spark.read.format("graft-docs")
      .option("numDocs", 50).load().select("doc_id", "text")
    TextSim.textRepetition(docs).filter(!col("repetitive"))
      .select("doc_id").queryExecution.optimizedPlan
  }

  test("pushed-down filter cannot re-expand the sort inside the fold") {
    // Walk the actual expression trees: every ArrayAggregate's MERGE
    // lambda must be free of ArraySort / StringSplit / ArrayTransform
    // nodes — the quadratic form had the full bigram pipeline inside
    // the fold body, re-run per fold step by interpreted eval. (The
    // fold's binding ARGUMENT legitimately contains them: it
    // evaluates once per row.)
    import org.apache.spark.sql.catalyst.expressions._
    val folds = composedOptimized.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case a: ArrayAggregate => a })
    assert(folds.nonEmpty, "expected the sorted-run fold in the plan")
    folds.foreach { a =>
      val bad = a.merge.collect {
        case s: ArraySort => s
        case s: StringSplit => s
        case s: ArrayTransform => s
      }
      assert(bad.isEmpty,
        s"expensive array expression re-expanded inside the fold lambda: $bad")
    }
  }

  test("substituted plan stays linear: bounded expression copies") {
    // Each output-column reference may copy the whole per-row
    // expression once (linear cost). The quadratic bug showed up as
    // array_sort re-expanded inside EVERY bg[..] reference of the
    // fold — copies growing with the expression itself, on top of
    // one per referenced column. Bound: the composed filter
    // references two derived columns, so a handful of copies at most.
    val n = "array_sort".r.findAllIn(composedOptimized.toString).size
    assert(n <= 4, s"array_sort appears $n times — substitution blow-up")
  }

  test("filter composition returns the same rows as post-hoc filtering") {
    val docs = spark.read.format("graft-docs")
      .option("numDocs", 500).load().select("doc_id", "text")
    val composed = TextSim.textRepetition(docs)
      .filter(!col("repetitive")).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val postHoc = TextSim.textRepetition(docs).collect()
      .filter(r => !r.getAs[Boolean]("repetitive"))
      .map(_.getLong(0)).sorted.toSeq
    assert(composed == postHoc)
    assert(composed.nonEmpty)
  }
}
