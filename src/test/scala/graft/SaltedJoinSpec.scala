package graft

import graft.ops.{Relational, Sources}
import org.apache.spark.sql.functions._

/** The skew-handling utility: salted join must be row-for-row
  * equivalent to the plain equi-join and actually spread a hot key
  * over the salt space.
  */
class SaltedJoinSpec extends SparkSpec {

  test("saltedJoin equals plain join on skewed synthetic data") {
    import spark.implicits._
    // 10k rows, 90% on one hot key — the classic skew shape
    val fact = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, 1L).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val dim = Seq((1L, "hot"), (20L, "cold"), (30L, "cold"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
    val salted = Relational.saltedJoin(fact, dim, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = salted.select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val b = plain.select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("salting spreads the hot key across the salt space") {
    import spark.implicits._
    val fact = spark.range(10000).select(lit(1L).as("k"),
      col("id").as("payload"))
    val dim = Seq((1L, "hot")).toDF("k", "label")
    val salts = 8
    val saltCol = pmod(xxhash64(struct(col("k"), col("payload"))),
      lit(salts))
    val nBuckets = fact.withColumn("_salt", saltCol)
      .select("_salt").distinct().count()
    assert(nBuckets == salts,
      s"expected the hot key spread over $salts salts, got $nBuckets")
    // and the join still returns every row exactly once
    assert(Relational.saltedJoin(fact, dim, "k", salts).count() == 10000)
  }

  test("saltedJoin on real tables matches join_fact row multiplicity") {
    val li = Sources.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Sources.table(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(o, Seq("k")).count()
    val salted = Relational.saltedJoin(li, o, "k", salts = 4).count()
    assert(salted == plain)
  }
}
