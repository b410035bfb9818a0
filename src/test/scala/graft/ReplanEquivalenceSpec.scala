package graft

import graft.ops.TextSim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression guards for the round-6 plan rewrites: each rewritten
  * query folded a join or per-row frame aggregate into a cheaper
  * equivalent, and these tests pin the CLAIM of that fold — the new
  * formulation computes the same values as the naive one it replaced
  * — on the real fixtures, so a future edit that breaks the algebra
  * (not just the oracle hash at one SF) fails loudly here.
  */
class ReplanEquivalenceSpec extends SparkSpec {

  test("window_anomaly: cum-minus-lag frame sums equal direct frame aggregates") {
    // the naive formulation the rewrite replaced, on the same input
    val frame = 10
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(-(frame - 1), 0)
    val naive = graft.ops.Sources.table(spark, sf, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).over(w)
          .cast(DoubleType).as("sx"),
        sum((col("value") * col("value")).cast(DecimalType(18, 6))).over(w)
          .cast(DoubleType).as("sxx"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // the shipped formulation, surfaced via its intermediate columns:
    // re-derive n/sx/sxx exactly as windowAnomaly does
    val wOrd = Window.partitionBy("user_id").orderBy(col("tsm"), col("event_id"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def trailing(cum: org.apache.spark.sql.Column) =
      (cum - coalesce(lag(cum, frame).over(wOrd), lit(0))).cast(DoubleType)
    val rewritten = graft.ops.Sources.table(spark, sf, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsm"), col("value"))
      .select(col("user_id"), col("event_id"), col("tsm"),
        row_number().over(wOrd).as("rn"),
        sum(col("value").cast(DecimalType(18, 4))).over(wCum).as("cx"),
        sum((col("value") * col("value")).cast(DecimalType(18, 6)))
          .over(wCum).as("cxx"))
      .select(col("user_id"), col("event_id"),
        least(col("rn"), lit(frame)).cast(LongType).as("n"),
        trailing(col("cx")).as("sx"), trailing(col("cxx")).as("sxx"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rewritten.keySet == naive.keySet)
    rewritten.foreach { case (k, v) =>
      assert(v == naive(k), s"frame stats diverge at $k: $v vs ${naive(k)}")
    }
    assert(naive.nonEmpty)
  }

  test("text_tfidf: window document frequency equals aggregate-join df") {
    val d = graft.ops.Sources.table(spark, sf, "documents").select(col("doc_id"), col("text"))
    val tf = d.select(col("doc_id"), explode(TextSim.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val joined = tf.join(
        tf.groupBy("token").agg(count(lit(1)).as("df")), "token")
      .select("doc_id", "token", "df")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val windowed = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .select("doc_id", "token", "df")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(windowed == joined && windowed.nonEmpty)
  }

  test("text_bigram_lm: window bigram/head counts equal aggregate-join counts") {
    val bg = graft.ops.Sources.table(spark, sf, "documents").select(col("doc_id"), col("text"))
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("words"))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(words) - 1)," +
          " i -> struct(words[i - 1] AS w1, words[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bf = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val uf = bf.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val joined = bg.join(bf, Seq("w1", "w2")).join(uf, Seq("w1"))
      .groupBy("w1", "w2", "c2", "c1").count()
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val windowed = bg
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("w1")))
      .groupBy("w1", "w2", "c2", "c1").count()
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(windowed == joined && windowed.nonEmpty)
  }

  test("kmeans early exit is lossless: converged centroids match a long run") {
    import spark.implicits._
    // separable fixture converges in a few rounds; after the bit-exact
    // fixed point, every further iteration is a no-op — so a 50-iter
    // budget must return exactly the centroids of a 5-iter budget
    val pts = (0 until 30).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(4)(d =>
        (c * 100.0 + (i / 3) * 0.01 + d * 0.001).toFloat))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val short = graft.ops.Cluster.kmeansCentroids(spark, emb, 3, 5)
    val long = graft.ops.Cluster.kmeansCentroids(spark, emb, 3, 50)
    assert(short.length == long.length)
    short.indices.foreach { i =>
      assert(java.util.Arrays.equals(short(i), long(i)),
        s"centroid $i diverged between iteration budgets")
    }
  }

  test("text_entropy: single-aggregate fold equals the three-stage shape") {
    def lnd(c: org.apache.spark.sql.Column) = round(log(c), 8)
    val tf = graft.ops.Sources.table(spark, sf, "documents").select(col("doc_id"), col("text"))
      .select(col("doc_id"), explode(TextSim.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val naive = tf.join(totals, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lnd(col("tf")).cast(DecimalType(18, 8)) * col("tf")).as("term"))
      .groupBy("doc_id", "n_tokens", "n_distinct")
      .agg(round(lnd(col("n_tokens")) -
        sum(col("term")).cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 4).as("entropy"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val shipped = TextSim.textEntropy(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(shipped == naive && shipped.nonEmpty)
  }
}
