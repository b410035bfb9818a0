package graft

import org.scalatest.funsuite.AnyFunSuite

/** EXPLAINS.md staleness guard (r8 VERDICT #1): stale plans shipped
  * two rounds running because the document was refreshed by hand.
  * This spec regenerates the document from HEAD under ExplainDump's
  * canonical session config and fails on ANY diff — a plan-affecting
  * change cannot land without `sbt "runMain graft.ExplainDump"`
  * rewriting the committed file. ID normalization inside
  * `ExplainDump.render` is what makes this comparison JVM-order
  * independent (expression ids are global counters).
  *
  * Deliberately NOT extending SparkSpec: the recorded plans are the
  * bench session's static shapes (AQE off, 8 shuffle partitions),
  * not the test session's. `ExplainDump.acquire()` hands back an
  * isolated `newSession()` child when the shared test session is
  * active (owned = false) — the shared session's confs are never
  * touched and it is never stopped from here.
  */
class ExplainsSyncSpec extends AnyFunSuite {

  test("EXPLAINS.md matches the plans regenerated from HEAD") {
    val committedPath = java.nio.file.Paths.get("EXPLAINS.md")
    assert(java.nio.file.Files.exists(committedPath),
      "EXPLAINS.md missing — run: sbt \"runMain graft.ExplainDump\"")
    val committed = java.nio.file.Files.readString(committedPath)
    val (spark, owned) = ExplainDump.acquire()
    spark.sparkContext.setLogLevel("ERROR")
    val regenerated =
      try ExplainDump.render(spark, ExplainDump.DefaultSf)
      finally if (owned) spark.stop()
    if (committed != regenerated) {
      val cl = committed.linesIterator.toVector
      val rl = regenerated.linesIterator.toVector
      val firstDiff = cl.zip(rl).indexWhere { case (a, b) => a != b } match {
        case -1 => math.min(cl.size, rl.size) // one is a prefix of the other
        case i  => i
      }
      val ctx = (math.max(0, firstDiff - 2) until
        math.min(math.max(cl.size, rl.size), firstDiff + 4)).map { i =>
        f"$i%5d | ${cl.lift(i).getOrElse("<EOF>")}%-60.60s | ${rl.lift(i).getOrElse("<EOF>")}"
      }.mkString("\n")
      fail(
        s"""EXPLAINS.md is stale: a plan or note changed without regenerating the doc.
           |Refresh it with: sbt "runMain graft.ExplainDump"   (then commit the diff)
           |First divergence at line $firstDiff (committed | regenerated):
           |$ctx""".stripMargin)
    }
  }
}
