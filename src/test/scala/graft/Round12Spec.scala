package graft

import graft.ops.{Aggregates, Sources, TextSim}
import org.apache.spark.sql.functions._

/** Round-12 operators: Gopher rule filter, vocabulary growth,
  * Zipf-slope fit, and the salted two-phase aggregate. Each test pins
  * an invariant the DuckDB hash-compare cannot see (non-vacuity,
  * cross-operator consistency, equivalence to the unsalted plan).
  */
class Round12Spec extends SparkSpec {

  test("quality_gopher verdict is non-vacuous and signals are in range") {
    val r = TextSim.qualityGopher(spark, sf).collect()
    assert(r.nonEmpty)
    val keeps = r.map(_.getBoolean(5)).toSet
    assert(keeps == Set(true, false),
      "gopher filter must actually split the corpus — a one-sided " +
        "verdict means the thresholds are vacuous on this fixture")
    r.foreach { row =>
      assert(row.getLong(4) >= 0L && row.getLong(4) <= 6L) // n_stop_distinct
      val dup = row.getDouble(3)
      assert(dup >= 0.0 && dup <= 1.0, s"dup_word_frac out of range: $dup")
      assert(row.getDouble(2) > 0.0) // mean_word_len
    }
  }

  test("quality_gopher word counts agree with tok_count") {
    val g = TextSim.qualityGopher(spark, sf)
      .agg(sum("n_words")).collect()(0).getLong(0)
    val t = TextSim.tokCount(spark, sf)
      .agg(sum("ws_tokens")).collect()(0).getLong(0)
    assert(g == t, s"gopher n_words total $g != tok_count ws_tokens $t")
  }

  test("vocab_growth totals reconcile with the corpus token stream") {
    val v = TextSim.vocabGrowth(spark, sf).collect()
    assert(v.nonEmpty)
    v.foreach { row =>
      val (nTok, nTyp, nHap) =
        (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(nTyp <= nTok && nHap <= nTyp,
        s"source ${row.getString(0)}: types $nTyp tokens $nTok hapax $nHap")
      assert(math.abs(row.getDouble(4) -
        nTyp.toDouble / nTok.toDouble) < 1e-6)
    }
    val totalFromOp = v.map(_.getLong(1)).sum
    val totalTokens = Sources.table(spark, sf, "documents")
      .select(explode(TextSim.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "").count()
    assert(totalFromOp == totalTokens)
  }

  test("zipf_slope matches a driver-side least-squares fit to 4dp") {
    val row = TextSim.zipfSlope(spark, sf).collect()
    assert(row.length == 1)
    val (n, slope, intercept) =
      (row(0).getLong(0), row(0).getDouble(1), row(0).getDouble(2))
    assert(n > 10 && n <= 100)
    assert(slope < 0.0, s"rank-frequency slope must be negative: $slope")
    // independent fit from the token counts themselves
    val freqs = Sources.table(spark, sf, "documents")
      .select(explode(TextSim.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token"))
      .limit(100).collect().map(_.getLong(1))
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.log(i + 1.0), math.log(f.toDouble))
    }
    val m = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val expSlope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(slope - expSlope) < 5e-4,
      s"slope $slope vs driver fit $expSlope")
    assert(math.abs(intercept - (sy - expSlope * sx) / m) < 5e-4)
  }

  test("agg_salted equals the plain one-phase GROUP BY exactly") {
    val salted = Aggregates.aggSalted(spark, sf).orderBy("event_type").collect()
    val plain = Sources.table(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DoubleType), 4).as("sum_value"))
      .orderBy("event_type").collect()
    assert(salted.length == plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getDouble(2) == b.getDouble(2),
        s"${a.getString(0)}: salted ${a.getDouble(2)} != ${b.getDouble(2)}")
    }
  }
}
