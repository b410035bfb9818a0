package graft

import java.nio.file.Files

import graft.ops.Sources
import org.apache.spark.sql.types._

/** Schema contract: every declared StructType in Sources matches what
  * Sources.table actually reads from the driver's parquet (names,
  * types, order). One wrong type here would cascade into hash
  * mismatches across every query touching the table — cheap insurance
  * (VERDICT r1 "What's wrong" #3).
  */
class SchemaContractSpec extends SparkSpec {

  private val declared: Map[String, StructType] = Sources.declaredTables

  private def shape(s: StructType): Seq[(String, DataType)] =
    s.fields.toSeq.map(f => (f.name, f.dataType))

  declared.foreach { case (name, expected) =>
    test(s"table $name parquet schema matches declared StructType") {
      val actual = Sources.table(spark, sf, name).schema
      assert(shape(actual) == shape(expected),
        s"\nactual:   ${shape(actual)}\nexpected: ${shape(expected)}")
    }
  }

  test("assertFixtureSchemas passes on the real fixtures") {
    graft.ops.Sources.assertFixtureSchemas(spark, sf)
  }

  test("assertFixtureSchemas names the drifted column in ONE message") {
    // doctor a fixture dir: every table but events symlinked from the
    // real one, events rewritten with ts as a string — the r10 failure
    // class (regenerated physical type) in miniature
    val dir = Files.createTempDirectory("graft-drift").toFile
    dir.deleteOnExit()
    Sources.declaredTables.keys.filter(_ != "events").foreach { t =>
      Files.createSymbolicLink(
        new java.io.File(dir, s"$t.parquet").toPath,
        java.nio.file.Paths.get(s"$sf/$t.parquet"))
    }
    Sources.table(spark, sf, "events")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("string"))
      .write.parquet(s"${dir.getAbsolutePath}/events.parquet")
    val e = intercept[IllegalStateException] {
      Sources.assertFixtureSchemas(spark, dir.getAbsolutePath)
    }
    assert(e.getMessage.contains("fixture schema changed"))
    assert(e.getMessage.contains("events"))
    assert(!e.getMessage.contains("lineitem"), // only the drifted table is named
      s"non-drifted table leaked into the diagnosis: ${e.getMessage}")
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
