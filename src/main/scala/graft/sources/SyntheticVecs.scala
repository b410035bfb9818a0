package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpus `(vec_id, embedding:
  * array<float>)` — the vector counterpart of the `graft-docs`
  * connector, for exercising the similarity/ANN surface at ANY scale
  * with zero input files. Each component is a pure function of
  * `(vec_id, dim index)` (xxhash64 → uniform in [-1, 1)), never of
  * partitioning — so any partition count or retry regenerates
  * bit-identical vectors (the replay-determinism rule every
  * regenerable source needs at 100 TB), and recall numbers measured
  * at local[32] reproduce exactly at local[4].
  */
object SyntheticVecs {

  /** `n` synthetic `dims`-dim vectors across `parts` partitions
    * (default 2× the session's parallelism).
    */
  def vectors(s: SparkSession, n: Long, dims: Int = 64,
              parts: Int = 0): DataFrame = {
    require(n >= 1 && dims >= 1, s"need n, dims >= 1; got ($n, $dims)")
    val p = if (parts > 0) parts else s.sparkContext.defaultParallelism * 2
    s.range(n).repartition(p)
      .select(col("id").as("vec_id"), expr(
        s"transform(sequence(1, $dims)," +
          " i -> CAST(pmod(xxhash64(id, i), 2000) - 1000 AS FLOAT) / 1000.0)")
        .as("embedding"))
  }
}
