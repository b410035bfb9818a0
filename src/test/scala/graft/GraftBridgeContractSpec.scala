package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.InternalRows

/** The upgrade contract for the one `private[sql]` bridge the library
  * ships (r19 VERDICT ask #4): every behavioral promise
  * `InternalRows.rebind` makes is asserted HERE, against a
  * checkpointed frame — the exact shape the CC loop hands across
  * sessions — so a Spark upgrade that silently changes `LogicalRDD` /
  * `internalCreateDataFrame` semantics fails this suite with a message
  * pointing at the bridge and its fallback, not as a mystery perf
  * regression three layers up. (A SIGNATURE change fails the bridge's
  * compile, which is the loudest possible message.)
  */
class GraftBridgeContractSpec extends SparkSpec {

  private def upgrade(what: String): String =
    s"graftbridge upgrade contract violated: $what — the LogicalRDD/" +
      "internalCreateDataFrame surface drifted under this Spark " +
      "version; see InternalRows.scala's scaladoc (fallback: " +
      "InternalRows.rebindPortable, public API, slower but correct)"

  private def checkpointed = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 2L))
      .toDF("doc_a", "doc_b").localCheckpoint()
  }

  test("rebind a checkpointed frame: row parity on the child session") {
    val src = checkpointed
    val child = spark.newSession()
    val re = InternalRows.rebind(child, src)
    assert(re.sparkSession eq child)
    assert(re.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === src.collect().map(r => (r.getLong(0), r.getLong(1))).sorted,
      upgrade("rebound rows differ from the source frame"))
  }

  test("rebind reuses the checkpointed LogicalRDD verbatim: same RDD," +
      " same attribute ids, partitioning and ordering carried") {
    val src = checkpointed
    val srcLr = src.queryExecution.logical match {
      case lr: LogicalRDD => lr
      case other => fail(upgrade(
        s"localCheckpoint no longer plans a LogicalRDD (got " +
          s"${other.getClass.getSimpleName})"))
    }
    val child = spark.newSession()
    val re = InternalRows.rebind(child, src)
    re.queryExecution.logical match {
      case lr: LogicalRDD =>
        assert(lr.rdd eq srcLr.rdd,
          upgrade("rebind recomputed the RDD instead of reusing the " +
            "checkpointed one — the no-recompute promise is broken"))
        assert(lr.output.map(_.exprId) == srcLr.output.map(_.exprId),
          upgrade("attribute ids were re-minted; downstream exchange " +
            "elision on the reused partitioning is broken"))
        assert(lr.outputPartitioning == srcLr.outputPartitioning,
          upgrade("outputPartitioning was dropped"))
        assert(lr.outputOrdering == srcLr.outputOrdering,
          upgrade("outputOrdering was dropped"))
      case other => fail(upgrade(
        s"rebind no longer plans a LogicalRDD (got " +
          s"${other.getClass.getSimpleName})"))
    }
  }

  test("rebind carries the source stats (broadcast decisions survive " +
      "the handoff)") {
    val src = checkpointed
    val srcStats = src.queryExecution.optimizedPlan.stats
    val child = spark.newSession()
    val re = InternalRows.rebind(child, src)
    val reStats = re.queryExecution.optimizedPlan.stats
    assert(reStats.sizeInBytes == srcStats.sizeInBytes,
      upgrade(s"sizeInBytes ${reStats.sizeInBytes} != source " +
        s"${srcStats.sizeInBytes}; a stats-less handoff degrades " +
        "downstream broadcast joins to sort-merge (measured 2x on " +
        "the CC round job)"))
    assert(reStats.rowCount == srcStats.rowCount,
      upgrade("rowCount was dropped from the handoff stats"))
  }

  test("rebind of a lazily-planned (non-checkpointed) frame: rows and " +
      "stats still carried") {
    import spark.implicits._
    val src = Seq((1L, 10L), (2L, 20L)).toDF("a", "b")
      .filter(col("a") > 0)
    val child = spark.newSession()
    val re = InternalRows.rebind(child, src)
    assert(re.collect().map(_.getLong(1)).sorted === Array(10L, 20L),
      upgrade("rebound rows differ (lazy-plan path)"))
    assert(re.queryExecution.optimizedPlan.stats.sizeInBytes ==
      src.queryExecution.optimizedPlan.stats.sizeInBytes,
      upgrade("stats dropped on the lazy-plan path"))
  }

  test("rebindPortable (the public-API fallback) row-matches rebind") {
    val src = checkpointed
    val child = spark.newSession()
    val a = InternalRows.rebind(child, src).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = InternalRows.rebindPortable(child, src).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a === b,
      "rebindPortable diverged from rebind — the documented fallback " +
        "is not a drop-in")
  }
}
