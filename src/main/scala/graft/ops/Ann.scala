package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate nearest-neighbor search over the `embeddings` table —
  * the scale path beyond TextSim.simSearch's brute-force scan.
  *
  * Design: sign-random-projection LSH built from deterministic
  * hash-derived hyperplanes (no RNG, no fitted model — the "planes"
  * are a pure function of (table id, dimension), so the query is
  * reproducible and needs no persisted state). Vectors land in a
  * 2^nBits-bucket code; the query probes only its own bucket and its
  * single-bit-flip neighbors (multi-probe), so the scan touches
  * O(candidates) instead of O(N). At 100 TB the bucket code is the
  * shuffle/partition key; brute force within a bucket is bounded.
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): a hash mapped to [-1, 1]. xxhash64 gives i.i.d.-ish signs
    * without any RNG state.
    */
  private def planeComponent(p: Int, d: Int): Double = {
    // splitmix64-style integer mix — fixed, engine-independent
    var z = (p.toLong * 1000003L + d.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** The LSH bucket code of an embedding column: bit p = sign of
    * ⟨v, plane_p⟩, computed as a codegen'd expression (no UDF).
    */
  def bucketCode(s: SparkSession, vecCol: String, dims: Int,
                 nBits: Int): org.apache.spark.sql.Column = {
    val bits = (0 until nBits).map { p =>
      val dotExpr = (0 until dims).map { d =>
        s"CAST(element_at($vecCol, ${d + 1}) AS DOUBLE) * ${planeComponent(p, d)}"
      }.mkString(" + ")
      s"CASE WHEN ($dotExpr) >= 0 THEN ${1L << p}L ELSE 0L END"
    }
    expr(bits.mkString(" + "))
  }

  /** `sim_ann_lsh` — LSH-bucketed cosine top-k for the query vector
    * `queryId`: code the corpus once, keep only vectors whose bucket
    * is within Hamming distance 1 of the query's bucket (multi-probe),
    * brute-force cosine inside that candidate set, top-k. NO ORACLE
    * (not SQL-expressible in DuckDB at reasonable effort); the
    * brute-force `sim_search` is the accuracy baseline it is
    * property-tested against.
    */
  def simAnnLsh(s: SparkSession, dir: String, queryId: Long = 0L,
                k: Int = 10, nBits: Int = 8, dims: Int = 64): DataFrame = {
    val e = Sources.table(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("bucket", bucketCode(s, "v", dims, nBits))
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .filter(bit_count(expr("bucket ^ qbucket")) <= 1)
      .select(col("vec_id"),
        round(TextSim.dot(col("v"), col("qv")) /
          (sqrt(TextSim.dot(col("v"), col("v"))) *
            sqrt(TextSim.dot(col("qv"), col("qv")))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
