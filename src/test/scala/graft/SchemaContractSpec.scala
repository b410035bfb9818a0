package graft

import graft.ops.Sources
import org.apache.spark.sql.types._

/** Schema contract: every declared StructType in Sources matches what
  * Sources.table actually reads from the driver's parquet (names,
  * types, order). One wrong type here would cascade into hash
  * mismatches across every query touching the table — cheap insurance
  * (VERDICT r1 "What's wrong" #3).
  */
class SchemaContractSpec extends SparkSpec {

  private val declared: Map[String, StructType] = Map(
    "region" -> Sources.region,
    "nation" -> Sources.nation,
    "customer" -> Sources.customer,
    "supplier" -> Sources.supplier,
    "part" -> Sources.part,
    "orders" -> Sources.orders,
    "lineitem" -> Sources.lineitem,
    "events" -> Sources.events,
    "documents" -> Sources.documents,
    "embeddings" -> Sources.embeddings)

  private def shape(s: StructType): Seq[(String, DataType)] =
    s.fields.toSeq.map(f => (f.name, f.dataType))

  declared.foreach { case (name, expected) =>
    test(s"table $name parquet schema matches declared StructType") {
      val actual = Sources.table(spark, sf, name).schema
      assert(shape(actual) == shape(expected),
        s"\nactual:   ${shape(actual)}\nexpected: ${shape(expected)}")
    }
  }

  test("embeddings vectors are fixed-width float arrays") {
    val df = Sources.table(spark, sf, "embeddings")
    import org.apache.spark.sql.functions._
    val sizes = df.select(size(col("embedding")).as("n"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(sizes.lengthCompare(1) == 0 && sizes.head > 0,
      s"expected one nonzero embedding width, got $sizes")
  }
}
