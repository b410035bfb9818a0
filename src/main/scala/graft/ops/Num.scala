package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric-determinism helpers (SURVEY.md §7.4.1).
  *
  * Floating-point SUMs are order-dependent: Spark's partial aggregation
  * merges partitions in a nondeterministic order, and the DuckDB oracle
  * sums in its own order, so `sum(double)` can differ in the last bits
  * between the two engines — enough to flip a `round(x, 4)` at a
  * boundary and fail the driver's hash compare.
  *
  * The fix used throughout the engine: cast the addend to an exact
  * DECIMAL first, sum exactly (associative, order-independent in both
  * engines), and cast the final result back to DOUBLE. The decimal is
  * identical on both sides, so the nearest-double conversion is
  * bit-identical. All test-data numerics carry ≤2 decimal digits, so a
  * scale-4/6 decimal is lossless for raw columns and captures products
  * of two/three 2-dp factors exactly.
  *
  * At 100 TB this stays safe: sum(DECIMAL(18,s)) widens to
  * DECIMAL(28,s) in Spark (38 in DuckDB) — room for ~1e10 rows of 1e14
  * magnitude before overflow, and decimal aggregation is codegen'd.
  */
object Num {

  /** Order-independent, engine-portable sum of a double column:
    * `CAST(SUM(CAST(c AS DECIMAL(18,scale))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact mean: exact decimal sum over count, divided as doubles —
    * bit-identical across engines because both inputs are.
    */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)
}
