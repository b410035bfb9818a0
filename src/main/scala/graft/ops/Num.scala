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

  /** Exact percentiles of one column by distributed SORT + targeted
    * order statistics, bit-identical to the builtin `percentile`
    * aggregate (same `p·(n−1)` position and the same WEIGHTED
    * interpolation `lower·(1−frac) + upper·frac` — NOT the
    * algebraically-equal `lower + (upper−lower)·frac`, whose double
    * rounding differs in the last bit; ExactPercentilesSpec caught
    * exactly that), but ~6× faster on a high-cardinality column:
    * `percentile` builds a boxed value→count map per partial and
    * serializes it to the merge (measured 2.27 s warm for ONE median
    * of sf0.1's 600k-distinct `l_extendedprice`, vs 0.39 s for a full
    * range-partitioned sort of the same column). The sort IS the
    * scale-correct shape — a TeraSort-style range shuffle, no
    * single-partition funnel, and the driver collects only the
    * ≤ 2·|ps| targeted order statistics.
    *
    * Runs 1 + 2 jobs at CALL time (count, then sort + zipWithIndex's
    * partition-count pass) — the eager-build pattern the dedup family
    * already uses; callers embed the returned values as literals, so
    * the big-side transform stays a pure broadcast-free projection.
    * RDD zipWithIndex is the one genuinely per-partition-imperative
    * step (global order index over a sorted relation has no
    * DataFrame spelling that avoids a one-partition window).
    */
  def exactPercentiles(df: org.apache.spark.sql.DataFrame, c: String,
                       ps: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(c).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, s"exactPercentiles($c): no non-null rows")
    val wanted = ps.flatMap { p =>
      val pos = p * (n - 1)
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
    }.toSet
    val picked = vals.sort("v").rdd.zipWithIndex()
      .filter { case (_, i) => wanted.contains(i) }
      .map { case (r, i) => (i, r.getDouble(0)) }
      .collect().toMap
    ps.map { p =>
      val pos = p * (n - 1)
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val frac = pos - lo
      // PercentileBase.getPercentile short-circuits to the lower order
      // statistic when the two straddling values are EQUAL (a percentile
      // landing inside a duplicate run); the weighted sum v·(1−frac)+v·frac
      // differs from v in the last bit for some (v, frac) pairs, so the
      // shortcut is required for bit-parity, not just speed.
      if (picked(lo) == picked(hi)) picked(lo)
      else picked(lo) * (1 - frac) + picked(hi) * frac
    }
  }

  // --- Packed lexicographic argmax/argmin -------------------------------
  //
  // min/max over a STRUCT (or any var-length) aggregation buffer can
  // only plan as a SortAggregate — both partials sort their full input
  // by the group keys. Packing the (rank, id) pair into ONE
  // DECIMAL(38,0) keeps a first/best-per-group cut in an ordinary
  // map-side-combined HashAggregate. Shared here because the idiom
  // appeared in four operators and immediately drifted (one site got
  // the unsigned shift wrong, two sites dropped the range guard):
  // the ordering proof and the guards live in exactly one place now.
  //
  // Contract: `rank` is a NON-NEGATIVE decimal with
  // rank ≤ 21684043449710088679 = ⌊(10³⁸ − 2⁶²)/2⁶²⌋ (then
  // rank·2⁶² + (2⁶² − 1) < 10³⁸, so the packed value stays exact in
  // DECIMAL(38,0); the bound admits a full unsigned-64-bit rank,
  // 2⁶⁴ < 2.168·10¹⁹ — the graft_dbits caller needs exactly that).
  // Both rank and id are guarded at runtime with `raise_error`:
  // `id` into [0, 2^62), `rank` into [0, that bound].
  // packAsc orders by (rank asc, id asc); packDesc by (rank asc,
  // id DESC) — i.e. max(packDesc) is the argmax by (rank, -id),
  // the "largest rank, smallest id" tie-break.

  /** 2^62 as a decimal literal — the id field width of the packing. */
  val packShiftSql: String = "CAST('4611686018427387904' AS DECIMAL(19,0))"

  private val packShift = expr(packShiftSql)

  private def guardedId(id: Column, ctx: String): Column =
    when(id < 0 || id >= lit(1L << 62),
      raise_error(concat(lit(s"$ctx: id out of packable range [0, 2^62): "),
        id.cast("string"))))
      .otherwise(id)

  /** ⌊(10³⁸ − 2⁶²)/2⁶²⌋ — the largest rank whose packing is provably
    * exact in DECIMAL(38,0) for every legal id.
    */
  val packMaxRankSql: String =
    "CAST('21684043449710088679' AS DECIMAL(20,0))"

  private val packMaxRank = expr(packMaxRankSql)

  private def guardedRank(rank: Column, ctx: String): Column =
    when(rank < 0 || rank > packMaxRank,
      raise_error(concat(
        lit(s"$ctx: rank out of packable range [0, (10^38-2^62)/2^62]: "),
        rank.cast("string"))))
      .otherwise(rank)

  /** `rank·2⁶² + id` — min/max ranks by (rank, id) lexicographic. */
  def packAsc(rank: Column, id: Column, ctx: String): Column =
    guardedRank(rank, ctx) * packShift +
      guardedId(id, ctx).cast(DecimalType(19, 0))

  /** `rank·2⁶² − id` — max ranks by (rank, −id): largest rank wins,
    * ties break to the SMALLEST id.
    */
  def packDesc(rank: Column, id: Column, ctx: String): Column =
    guardedRank(rank, ctx) * packShift -
      guardedId(id, ctx).cast(DecimalType(19, 0))

  /** Recover the id from a [[packAsc]] value (requires rank ≥ 0, so
    * the packed value is non-negative and `%` is a true modulus).
    */
  def unpackIdAsc(packed: Column): Column =
    (packed % packShift).cast(org.apache.spark.sql.types.LongType)

  /** Recover the id from a [[packDesc]] value given the group's
    * max rank (exact: the packed argmax carries exactly that rank).
    */
  def unpackIdDesc(maxRank: Column, packedMax: Column): Column =
    (maxRank * packShift - packedMax)
      .cast(org.apache.spark.sql.types.LongType)
}
