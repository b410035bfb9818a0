package graft

import graft.ops.Sources

/** The SQL-first API surface: every table registers as a view and
  * spark.sql produces the same results as the Column-DSL plans — the
  * two front doors of the engine must agree.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Sources.table(spark, sf, t).createOrReplaceTempView(t)
    }

  test("SQL flagship (TPC-H Q1 shape) equals the DSL plan") {
    registerViews()
    val sqlRows = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSeq
    val dslRows = graft.ops.Aggregates.aggGroup(spark, sf)
      .selectExpr("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(sqlRows == dslRows)
  }

  test("SQL multiway join equals the DSL plan") {
    registerViews()
    val sqlN = spark.sql(
      """SELECT n_name, count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val dslN = graft.ops.Relational.joinMultiway(spark, sf)
      .selectExpr("n_name", "n_items")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(sqlN == dslN && sqlN.nonEmpty)
  }

  test("custom expressions resolve from SQL on real tables") {
    registerViews()
    graft.functions.VectorFunctions.registerAll(spark)
    val n = spark.sql(
      """SELECT count(*) FROM (
        |SELECT vec_id,
        |graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS selfdot
        |FROM embeddings) t WHERE selfdot > 0""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == Sources.table(spark, sf, "embeddings").count())
    val fp = spark.sql(
      "SELECT count(*) FROM (SELECT graft_winnow(text, 12, 4) AS f FROM documents) t WHERE size(f) > 0")
      .collect()(0).getLong(0)
    assert(fp > 0)
  }

  test("set_intersect equals the semi-join-of-distincts formulation") {
    import org.apache.spark.sql.functions.col
    val got = graft.ops.Relational.setIntersect(spark, sf).collect()
      .map(_.getLong(0)).sorted
    assert(got.distinct.length == got.length)
    val o = Sources.table(spark, sf, "orders")
    val expected = o.filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct()
      .join(o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .distinct(), Seq("o_custkey"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expected))
  }
}
