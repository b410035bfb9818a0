package graft

import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md totals staleness guard (r13 VERDICT #1: the headline
  * and totals tables understated the engine by a full round after the
  * final bench artifacts were committed without regenerating the doc
  * — the third recurrence of this staleness class since r9).
  *
  * The FIRST "Oracle-subset totals" table in BASELINE.md must match
  * the four committed bench artifacts: Spark totals from
  * BENCH_LOCAL_SF001.json / BENCH_LOCAL.json and DuckDB totals from
  * BENCH_DUCK_SF001.json / BENCH_DUCK_SF01.json, summed over the
  * oracle-matched query set (present in all four). Tolerance covers
  * the doc's one-decimal rounding only — a re-measured artifact
  * cannot land without `python3 tools/baseline_table.py ...`
  * refreshing the doc. No Spark session involved.
  */
class BaselineSyncSpec extends AnyFunSuite {

  private def queryMap(file: String): Map[String, Double] = {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(file))
    // minimal extraction of the flat "queries" object: locate the key,
    // then scan its balanced braces and pull "name": number pairs.
    val start = txt.indexOf("\"queries\"")
    assert(start >= 0, s"$file has no queries map")
    val open = txt.indexOf('{', start)
    var depth = 0; var i = open; var end = -1
    while (end < 0 && i < txt.length) {
      txt.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _   =>
      }
      i += 1
    }
    val body = txt.substring(open + 1, end)
    val entry = """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r
    entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  test("BASELINE.md latest totals table matches the committed bench artifacts") {
    val doc = java.nio.file.Files.readString(java.nio.file.Paths.get("BASELINE.md"))
    val anchor = doc.indexOf("Oracle-subset totals")
    assert(anchor >= 0, "BASELINE.md lost its 'Oracle-subset totals' section")
    val tail = doc.substring(anchor).linesIterator.toVector

    def rowNums(marker: String): (Double, Double) = {
      val row = tail.find(l => l.startsWith("|") && l.contains(marker))
        .getOrElse(fail(s"no '$marker' row after the totals anchor"))
      val cells = row.split("\\|").map(_.replace("*", "").replace("s", "").trim)
        .filter(_.nonEmpty)
      // | engine | sf0.01 total | sf0.1 total | marginal |
      (cells(1).toDouble, cells(2).toDouble)
    }
    val (docS001, docS01) = rowNums("Spark (this engine")
    val (docD001, docD01) = rowNums("DuckDB (same window")

    val s001 = queryMap("BENCH_LOCAL_SF001.json")
    val s01 = queryMap("BENCH_LOCAL.json")
    val d001 = queryMap("BENCH_DUCK_SF001.json")
    val d01 = queryMap("BENCH_DUCK_SF01.json")
    val common = s001.keySet & s01.keySet & d001.keySet & d01.keySet
    assert(common.size > 100, s"suspiciously small oracle-matched set: ${common.size}")

    def tot(m: Map[String, Double]) = common.toSeq.map(m).sum
    val checks = Seq(
      ("Spark sf0.01", docS001, tot(s001)),
      ("Spark sf0.1", docS01, tot(s01)),
      ("DuckDB sf0.01", docD001, tot(d001)),
      ("DuckDB sf0.1", docD01, tot(d01)))
    val stale = checks.filter { case (_, doc, art) => math.abs(doc - art) > 0.15 }
    assert(stale.isEmpty,
      stale.map { case (n, doc, art) => f"$n: doc $doc%.2f vs artifacts $art%.2f" }
        .mkString(
          "BASELINE.md totals are stale vs the committed artifacts.\n" +
            "Refresh with: python3 tools/baseline_table.py BENCH_LOCAL_SF001.json " +
            "BENCH_LOCAL.json BENCH_DUCK_SF001.json BENCH_DUCK_SF01.json\n", "\n", ""))
  }
}
