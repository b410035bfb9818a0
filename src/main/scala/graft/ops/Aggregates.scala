package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregations A1–A9 — the reference's DataQualityChecker /
  * DataProfiler / ETLMetrics reductions (etl_2022.py:46-121,
  * etl_2020.py:20-34) plus the grouped/rollup extensions mandated by
  * the star-schema test data.
  *
  * Scale notes: every op here is a single-scan multi-aggregate (the
  * reference's "single-pass combined checks", etl_2022.py:74-79) —
  * Spark plans one partial (map-side) + one final hash aggregate, so
  * at 100 TB the shuffle carries one row per group, not per input row.
  * Exact `percentile` is the one exception (holds per-group values);
  * at true scale swap `approx_percentile` — kept exact here because
  * the DuckDB oracle (and pandas `quantile`) are exact.
  */
object Aggregates {
  import Num._

  /** `agg_null_counts` — A2, per-column null counts
    * (`df.isnull().sum()`, etl_2022.py:52-54), one scan.
    */
  def aggNullCounts(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.table(s, dir, "events")
    val aggs = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      .map(c => (count(lit(1)) - count(col(c))).as(s"nulls_$c"))
    ev.agg(aggs.head, aggs.tail: _*)
  }

  /** `agg_distinct` — A3, `nunique()` (etl_2022.py:94). Exact distinct;
    * at 100 TB prefer `approx_count_distinct` (HLL) — kept exact for
    * the oracle.
    */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .agg(countDistinct(col("user_id")).as("distinct_users"),
        countDistinct(col("event_type")).as("distinct_types"))

  /** `agg_distinct_approx` — the 100 TB variant of A3: HyperLogLog++
    * sketches instead of exact distinct. Shuffle rows are sketch-sized
    * (KB) instead of one-per-distinct-value; results are deterministic
    * (register maxima are order-independent) but engine-specific, so
    * NO ORACLE — the exact `agg_distinct` is the accuracy baseline.
    */
  def aggDistinctApprox(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        approx_count_distinct(col("event_type")).as("approx_types"))

  /** `agg_profile_approx` — the 100 TB swap for [[aggProfile]]: same
    * shape, but the median is a t-digest `approx_percentile` (bounded
    * sketch on the shuffle instead of the full value set exact
    * `percentile` must see). Deterministic but engine-specific → NO
    * ORACLE; `agg_profile` is the accuracy baseline, and the unit spec
    * bounds the approximation error against it.
    */
  def aggProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Sources.table(s, dir, "lineitem")
    def profile(c: String): DataFrame =
      li.agg(
        count(col(c)).as("n"),
        // r15: exact mean via long units like agg_profile's
        // (bit-identical to the davg it replaces; quantity integer,
        // price/discount exactly 2 dp)
        profileMean(c).as("mean"),
        expr(s"approx_percentile($c, 0.5)").as("median_approx"),
        round(stddev_samp(col(c)), 4).as("std"),
        min(col(c)).as("min_val"),
        max(col(c)).as("max_val"))
        .select(lit(c).as("col_name"), col("n"), col("mean"),
          col("median_approx"), col("std"), col("min_val"), col("max_val"))
    profile("l_quantity")
      .unionByName(profile("l_extendedprice"))
      .unionByName(profile("l_discount"))
  }

  /** `agg_distinct_bound` — the error-bound ORACLE row for
    * [[aggDistinctApprox]] (r18 VERDICT ask #4), closing the last
    * untwinned verification gap: the HLL++ estimate itself is
    * engine-specific and can never hash-match DuckDB, but its
    * documented accuracy contract CAN — emit the exact distinct
    * counts (oracle-checkable arithmetic) plus one BOOLEAN verdict
    * per sketch: `|approx − exact| ≤ 3·rsd·exact` at the explicit
    * `rsd = 0.05`. The verdict is deterministic: HLL register maxima
    * are insertion-order independent (same device that makes
    * `agg_distinct_approx` deterministic across local[32]/local[4] in
    * detcheck), and the 3σ band turns the probabilistic rsd contract
    * into a fixed predicate on this fixed dataset. DuckDB predicts
    * `TRUE` without running a sketch — a Spark-side estimator drifting
    * outside its own documented 3σ bound flips the hash.
    */
  def aggDistinctBound(s: SparkSession, dir: String): DataFrame = {
    val rsd = 0.05
    val bound = 3 * rsd
    Sources.table(s, dir, "events")
      .agg(countDistinct(col("user_id")).as("exact_users"),
        countDistinct(col("event_type")).as("exact_types"),
        approx_count_distinct(col("user_id"), rsd).as("au"),
        approx_count_distinct(col("event_type"), rsd).as("at"))
      .select(col("exact_users"), col("exact_types"),
        (abs(col("au") - col("exact_users")) <=
          col("exact_users").cast(DoubleType) * bound).as("users_in_bound"),
        (abs(col("at") - col("exact_types")) <=
          col("exact_types").cast(DoubleType) * bound).as("types_in_bound"))
  }

  /** `agg_profile_bound` — the same error-bound oracle device for
    * [[aggProfileApprox]]'s t-digest median: per profile column, the
    * exact interpolated median (the arithmetic `agg_profile` already
    * hash-matches against DuckDB's `quantile_cont`) plus a BOOLEAN
    * rank-window verdict for the sketch. `approx_percentile(c, 0.5,
    * 10000)` guarantees a returned DATA VALUE whose rank is within
    * ε = 1/10000 of the true median rank; the verdict checks it lies
    * inside the exact [0.5−δ, 0.5+δ] interpolated-percentile window
    * at δ = 0.005 — 50× the rank bound, so merge slack in the
    * quantile-summary compression can never flip it, while a genuinely
    * broken sketch (rank off by > 0.5 % of the distribution) still
    * fails loudly. δ > ε makes the interpolated window safe for a
    * discrete sketch value: if the returned value sat below the
    * interpolated 0.5−δ point, its maximum rank would be below
    * (0.5−δ)·n < (0.5−ε)·n, outside the sketch's own guarantee.
    */
  def aggProfileBound(s: SparkSession, dir: String): DataFrame = {
    val li = Sources.table(s, dir, "lineitem")
    val delta = 0.005
    val ps = Seq(0.5 - delta, 0.5, 0.5 + delta)
    // Exact-percentile path per column, costed (measured at sf0.1):
    // the builtin percentile builds a boxed value→count map per
    // partial, so its cost is the column's DISTINCT count — three
    // scalar calls on the 600k-distinct price column took 6.4 s, the
    // array form (one shared map) 3.1 s, and the range-partitioned
    // sort ([[Num.exactPercentiles]]) 0.4 s. quantity/discount have
    // ~50/11 distinct values, where the tiny map is cheaper than an
    // extra sort job pair — so the high-cardinality column takes the
    // sort path and the discrete ones keep the one-pass array form,
    // the same cardinality rule encode_bucket's scaladoc records.
    val sortPath = Set("l_extendedprice")
    def one(c: String): DataFrame =
      if (sortPath(c)) {
        val Seq(lo, med, hi) = Num.exactPercentiles(li, c, ps)
        li.agg(expr(s"approx_percentile($c, 0.5, 10000)").as("ap"))
          .select(lit(c).as("col_name"), lit(med).as("median"),
            (col("ap").cast(DoubleType) >= lo &&
              col("ap").cast(DoubleType) <= hi).as("median_in_bound"))
      } else li.agg(
        expr(s"percentile($c, array(${ps.mkString(", ")}))").as("pcts"),
        expr(s"approx_percentile($c, 0.5, 10000)").as("ap"))
        .select(lit(c).as("col_name"),
          element_at(col("pcts"), 2).as("median"),
          (col("ap").cast(DoubleType) >= element_at(col("pcts"), 1) &&
            col("ap").cast(DoubleType) <= element_at(col("pcts"), 3))
            .as("median_in_bound"))
    one("l_quantity")
      .unionByName(one("l_extendedprice"))
      .unionByName(one("l_discount"))
  }

  /** `agg_profile` — A1/A4/A5, per-column profile (etl_2022.py:98-105):
    * count/mean/median/std/min/max for each numeric, one row per
    * column (all three single-scan aggregates, unioned).
    * pandas semantics preserved: exact median, sample stddev (ddof=1).
    */
  def aggProfile(s: SparkSession, dir: String): DataFrame =
    profileOf(Sources.table(s, dir, "lineitem"))

  /** [[aggProfile]]'s per-column profile over any relation carrying the
    * three lineitem numerics — the reusable "fit" half of
    * [[profileDrift]].
    */
  def profileOf(li: DataFrame): DataFrame = {
    val (one, medians) = profileFit(li, None)(0)
    profileFrame(li.sparkSession, one, medians)
  }

  private val profileCols = Seq("l_quantity", "l_extendedprice",
    "l_discount")

  /** One authoritative per-column long-unit scale for the profile
    * family (r15 ADVICE: the name-keyed `if` was duplicated in
    * [[aggProfileApprox]] and [[profileSimpleAggs]] and easy to
    * drift): quantity is integer-valued, price/discount exactly 2 dp
    * in the fixtures. [[profileMean]] dispatches here; a column with
    * no entry falls back to the decimal [[Num.davg]] (scale 4) —
    * slower per row but exact for anything up to 4 dp, matching the
    * pre-r15 behavior instead of the units round-trip guard raising
    * at runtime.
    */
  private val profileScale: Map[String, Int] =
    Map("l_quantity" -> 0, "l_extendedprice" -> 2, "l_discount" -> 2)

  /** Exact mean for a profiled column: long-unit fast path at the
    * column's known scale, decimal fallback for unknown columns.
    */
  private def profileMean(c: String): Column =
    profileScale.get(c).map(lavg(col(c), _)).getOrElse(davg(col(c)))

  /** The 15 map-reducible profile metrics — every one a codegen'd
    * hash-aggregate function. Means are exact long-unit sums
    * ([[Num.lavg]] — quantity integer, price/discount exactly 2 dp),
    * bit-identical to the decimal spelling without per-row BigDecimal.
    */
  private def profileSimpleAggs: Seq[Column] =
    profileCols.flatMap { c => Seq(
      count(col(c)).as(s"n_$c"),
      profileMean(c).as(s"mean_$c"),
      round(stddev_samp(col(c)), 4).as(s"std_$c"),
      min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c")) }

  /** The shared profile fit engine behind [[profileOf]] (ungrouped)
    * and [[profileDriftQuery]] (grouped by snapshot half): per group,
    * the 15-metric fit row plus the EXACT median of every profile
    * column. One authoritative implementation (r13 ADVICE: the two
    * hand-copied refine spellings could drift).
    *
    * Plan shape (r14): three fully-codegen jobs, no
    * TypedImperativeAggregate anywhere —
    *   1. [[Num.sampleBracketsGrouped]]: fixed-seed 2% sample →
    *      driver-side per-(group, column) median brackets;
    *   2. the fused fit: 15 metrics + [[Num.refineCountAggs]]' four
    *      conditional sums per column (grouped brackets enter as a
    *      CASE over the group key) — ONE HashAggregateExec pass;
    *   3. interior collect, only for (group, column)s whose `inwin`
    *      count is non-zero and ≤ [[Num.maxInterior]] (tiny-domain
    *      columns like quantity/discount have EMPTY interiors — their
    *      duplicate runs land on the bracket edges as counts).
    * The r13 spelling kept the builtin `percentile`s and a GK probe
    * INSIDE the fit, which demoted the whole pass to
    * ObjectHashAggregateExec: measured at sf0.1, 0.72 s for the fused
    * fit vs 0.23 s codegen'd — the entire agg_profile/profile_drift
    * marginal gap vs the baseline. Any bracket miss (sample bound
    * violated, sparse column missed by the sample, interior too big)
    * falls back per-column to the sort-based [[Num.exactPercentiles]]
    * — exactness is unconditional, the sample only bounds where to
    * look. At n where 5n/√m outgrows [[Num.maxInterior]], the GK
    * bracket path ([[Num.bracketExpr]], interior 6n/accuracy) is the
    * documented swap.
    */
  private def profileFit(li0: DataFrame, groupCol: Option[Column])
      : Map[Int, (org.apache.spark.sql.Row, Map[String, Option[Double]])] = {
    // r17 A/B, no-win result kept on record: persisting the narrow
    // (__gk, profile columns) projection across the fit's 2–3 jobs
    // (bracket sample, fused fit, interior collect) did NOT beat
    // re-scanning at sf0.1 — cached 0.69 vs uncached 0.59/0.73 s
    // min across two focused windows, i.e. inside this host's window
    // noise, because the in-memory columnar cache build costs about
    // what the two column-pruned parquet re-decodes cost. Re-scanning
    // stays as the simpler form that also scales better: at 100 TB
    // pruned scans are cheap and a ~40 TB cache write is not.
    val li = li0.select(
      (groupCol.getOrElse(lit(0)).cast(IntegerType).as("__gk") +:
        profileCols.map(col)): _*)
    val br = Num.sampleBracketsGrouped(li, Some(col("__gk")), profileCols, 0.5)
    val gExpr = col("__gk")

    def boundExpr(c: String, pick: ((Double, Double)) => Double): Column = {
      val gs = br.keys.filter(_._2 == c).map(_._1).toSeq.sorted
      val vals = gs.map(g => pick(br((g, c)))).distinct
      if (gs.isEmpty) lit(null).cast(DoubleType)
      else if (vals.size == 1) lit(vals.head) // same bound in every group
      else gs.foldLeft(lit(null).cast(DoubleType)) { (acc, g) =>
        when(gExpr === g, lit(pick(br((g, c))))).otherwise(acc)
      }
    }
    val refineAggs = profileCols.flatMap { c =>
      Num.refineCountAggs(col(c).cast(DoubleType),
        boundExpr(c, _._1), boundExpr(c, _._2), c)
    }
    val aggCols = profileSimpleAggs ++ refineAggs
    val fitRows: Map[Int, org.apache.spark.sql.Row] = groupCol match {
      case None =>
        Map(0 -> li.agg(aggCols.head, aggCols.tail: _*).collect()(0))
      case Some(_) =>
        li.groupBy(gExpr.as("gk")).agg(aggCols.head, aggCols.tail: _*)
          .collect().map { r =>
            // getInt on a NULL key silently reads 0 — a nullable group
            // column would merge its null group into group 0 (and
            // collide fit rows); fail loudly instead
            require(!r.isNullAt(r.fieldIndex("gk")),
              "profileFit: NULL group key — the grouped fit requires " +
                "a non-null group column")
            r.getInt(r.fieldIndex("gk")) -> r
          }.toMap
    }
    def cnt(r: org.apache.spark.sql.Row, f: String): Long =
      Option(r.getAs[Any](f)).map(_.asInstanceOf[Long]).getOrElse(0L)

    // one combined interior-collect job for every (group, column) that
    // needs one; most need none (inwin == 0 for discrete columns)
    val need = fitRows.toSeq.flatMap { case (g, row) =>
      profileCols.collect {
        case c if br.contains((g, c)) && cnt(row, s"inwin_$c") > 0 &&
          cnt(row, s"inwin_$c") <= Num.maxInterior => (g, c)
      }
    }
    val wins: Map[(Int, String), Array[Double]] =
      if (need.isEmpty) Map.empty
      else {
        val sel = gExpr.as("g") +: profileCols.map { c =>
          val v = col(c).cast(DoubleType)
          val conds = need.filter(_._2 == c).map { case (g, _) =>
            val (blo, bhi) = br((g, c))
            (gExpr === g) && v > lit(blo) && v < lit(bhi)
          }
          if (conds.isEmpty) lit(null).cast(DoubleType).as(s"w_$c")
          else when(conds.reduce(_ || _), v).as(s"w_$c")
        }
        val keep = profileCols.map(c => col(s"w_$c").isNotNull).reduce(_ || _)
        val rows = li.select(sel: _*).filter(keep).collect()
        need.map { case (g, c) =>
          val i = 1 + profileCols.indexOf(c)
          val vs = rows.iterator
            .filter(r => r.getInt(0) == g && !r.isNullAt(i))
            .map(_.getDouble(i)).toArray
          java.util.Arrays.sort(vs)
          (g, c) -> vs
        }.toMap
      }

    fitRows.map { case (g, row) =>
      val medians = profileCols.map { c =>
        val n = cnt(row, s"n_$c")
        val m: Option[Double] =
          if (n == 0) None // all-null column: median null, no jobs
          else {
            val inwin = cnt(row, s"inwin_$c")
            val refined = br.get((g, c))
              .filter(_ => inwin == 0 || wins.contains((g, c)))
              .flatMap { case (blo, bhi) =>
                Num.percentileFromWindow(n, 0.5, cnt(row, s"below_$c"),
                  cnt(row, s"eqlo_$c"), cnt(row, s"eqhi_$c"),
                  wins.getOrElse((g, c), Array.empty[Double]).toIndexedSeq,
                  blo, bhi)
              }
            Some(refined.getOrElse {
              val scoped =
                if (groupCol.isEmpty) li else li.filter(gExpr === g)
              Num.exactPercentiles(scoped, c, Seq(0.5), n).head
            })
          }
        c -> m
      }.toMap
      g -> (row, medians)
    }
  }

  /** Rebuild the 3-row profile frame from the collected fit row plus
    * the refined medians — driver-side literals, no further jobs.
    */
  private def profileFrame(s: SparkSession,
                           one: org.apache.spark.sql.Row,
                           medians: Map[String, Option[Double]]): DataFrame = {
    def dOf(name: String): java.lang.Double =
      Option(one.getAs[Any](name)).map(_.asInstanceOf[Double])
        .map(java.lang.Double.valueOf).orNull
    import s.implicits._
    profileCols.sorted.map { c =>
      (c, one.getAs[Long](s"n_$c"), dOf(s"mean_$c"),
        medians(c).map(java.lang.Double.valueOf).orNull,
        dOf(s"std_$c"), dOf(s"min_$c"), dOf(s"max_$c"))
    }.toDF("col_name", "n", "mean", "median", "std", "min_val", "max_val")
  }

  /** `profile_drift` — the declared-query form of [[profileDrift]]:
    * profile two deterministic snapshots of `lineitem` (even vs odd
    * order keys — the stand-in for yesterday's batch vs today's) and
    * emit per-metric relative drift + verdict.
    *
    * Both snapshots fit in ONE grouped pass of the shared
    * [[profileFit]] engine (`GROUP BY l_orderkey % 2` — identical
    * per-group values to the filtered [[profileOf]] calls it replaces;
    * ProfileFitSpec pins the equivalence), with each half's bracket
    * literals entering the fused aggregate as a CASE over the half
    * key. The drift join then broadcasts two 3-row literal frames —
    * monitoring cost is profile cost, constant output at any scale.
    */
  def profileDriftQuery(s: SparkSession, dir: String): DataFrame = {
    val li = Sources.table(s, dir, "lineitem")
    val h = (col("l_orderkey") % 2).cast(IntegerType)
    val fit = profileFit(li, Some(h))
    require(fit.keySet == Set(0, 1),
      s"profile_drift expects both snapshot halves, got ${fit.keySet}")
    profileDrift(
      profileFrame(s, fit(0)._1, fit(0)._2),
      profileFrame(s, fit(1)._1, fit(1)._2))
  }

  /** `agg_rates` — A6, valid/invalid counts + rate (etl_2020.py:20-34,
    * etl_2022.py:34-44) via conditional aggregation, one scan.
    */
  def aggRates(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .agg(
        sum(when(Transforms.validEvent, 1L).otherwise(0L)).as("valid_count"),
        sum(when(Transforms.validEvent, 0L).otherwise(1L)).as("invalid_count"))
      .select(col("valid_count"), col("invalid_count"),
        (col("valid_count").cast(DoubleType) /
          (col("valid_count") + col("invalid_count")).cast(DoubleType))
          .as("valid_rate"))

  /** `agg_having` — A7, alert thresholds over aggregates
    * (etl_2022.py:111-121) as a HAVING filter.
    */
  def aggHaving(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") > 1900)

  /** `agg_group` — A8, the flagship TPC-H-Q1-shaped grouped aggregate:
    * scan → pushed filter on l_shipdate → partial+final hash agg on
    * (l_returnflag, l_linestatus) → sort. All sums exact and
    * order-independent; averages are exact-sum / count (see Num).
    *
    * r13: the exact sums run as LONG unit sums ([[Num.units]] —
    * quantities are integers, prices/discounts/taxes exactly 2 dp, so
    * every per-row unit is exact and the sums codegen to primitive
    * long adds) instead of [[Num.dsum]]'s DECIMAL(28,s) buffer, whose
    * every add went through BigDecimal. The disc-price and charge
    * products multiply in INTEGER unit space (cents × (100−disc¢) ×
    * (100+tax¢)), so they are exact by construction rather than by a
    * double-rounding argument. Bit-identical outputs (same exact
    * rationals → same closing double casts); measured 0.93 → ~0.4 s
    * at sf0.1. Overflow headroom (ANSI long sums throw, never wrap):
    * charge units ≤ ~1.2e11/row → safe past 7·10⁷ rows per group;
    * beyond that swap back to the dsum spelling.
    */
  def aggGroup(s: SparkSession, dir: String): DataFrame = {
    // checked units projected once per column (see [[aggCorr]]);
    // products reference the plain long attributes
    val li = Sources.table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
      .select(col("l_returnflag"), col("l_linestatus"),
        units(col("l_quantity"), 0).as("qty_u"),
        units(col("l_extendedprice"), 2).as("price_u"),
        units(col("l_discount"), 2).as("disc_u"),
        units(col("l_tax"), 2).as("tax_u"))
    val qtyU = col("qty_u")
    val priceU = col("price_u")
    val discU = col("disc_u")
    val discPriceU = priceU * (lit(100L) - discU)           // scale 4
    val chargeU = discPriceU * (lit(100L) + col("tax_u"))   // scale 6
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        fromUnits(sum(qtyU), 0).as("sum_qty"),
        fromUnits(sum(priceU), 2).as("sum_base_price"),
        fromUnits(sum(discPriceU), 4).as("sum_disc_price"),
        fromUnits(sum(chargeU), 6).as("sum_charge"),
        (fromUnits(sum(qtyU), 0) / count(lit(1))).as("avg_qty"),
        (fromUnits(sum(priceU), 2) / count(lit(1))).as("avg_price"),
        (fromUnits(sum(discU), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Two-level Expand-family spelling (r14): pre-aggregate the input
    * to its DISTINCT GROUP TUPLES first, then run the
    * rollup/cube/grouping-sets over the pre-aggregated rows. Spark
    * plans grouping sets as Expand → hash aggregate, and Expand
    * multiplies EVERY INPUT ROW by the number of grouping sets before
    * any aggregation — n·|sets| hash updates. Pre-aggregating cuts
    * that to n + g·|sets| where g is the (bounded) group-tuple count,
    * and both levels stay codegen'd partial+final hash aggregates.
    * Exactness: counts re-enter as sums of counts; the price sum runs
    * as TWO primitive long sums per pre-group over a BALANCED 14-bit
    * split of the cent units (r18, closing the r17 ADVICE overflow
    * item: a single long unit sum is ANSI-loud past ~1.7·10¹¹
    * rows/group at ~$500k prices — i.e. could first manifest in
    * production at the 100 TB design point; the classic 32-bit
    * [[Num.unitsHi]] split is dead weight for cent money since hi ≡ 0,
    * but splitting at bits ≈ log₂(u_max)/2 bounds BOTH half-sums by
    * n·2¹⁴, making the pre-aggregate exact by construction to
    * ~5.6·10¹⁴ rows per group — ~50 PB of rows in ONE group tuple —
    * with no heuristic, no extra job, and loud behavior preserved
    * beyond even that). Phase 2 recombines the halves as
    * DECIMAL(38,0) — a handful of exact decimal adds over the bounded
    * group tuples — then closes to the same double the old one-level
    * decimal spelling produced ([[Num.fromUnitsHiLo]]). At 100 TB
    * this is the difference between expanding 10¹² rows ×|sets| and
    * expanding a few hundred group tuples.
    */
  private val PreSplitBits = 14

  private def preAggregated(input: DataFrame, keys: Seq[String],
                            price: String): DataFrame = {
    val u = units(col(price), 2)
    input.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("pre_n"),
        sum(Num.unitsHi(u, PreSplitBits)).as("pre_uh"),
        sum(Num.unitsLo(u, PreSplitBits)).as("pre_ul"))
  }

  /** Phase-2 closer for [[preAggregated]]'s split long partials: exact
    * decimal recombination to the double the one-level decimal sum
    * would produce.
    */
  private def preSumClosed: Column =
    Num.fromUnitsHiLo(sum(col("pre_uh").cast(DecimalType(38, 0))),
      sum(col("pre_ul").cast(DecimalType(38, 0))), 2, PreSplitBits)

  /** [[preAggregated]] for count-only consumers — no decimal-sum
    * accumulator for a column the query never reads.
    */
  private def preCounted(input: DataFrame, keys: Seq[String]): DataFrame =
    input.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("pre_n"))

  /** `agg_cube` — A9's other grouping-set shape: order counts by
    * (orderstatus, orderpriority) with ALL subtotal combinations.
    * Pre-aggregated ([[preAggregated]]) so the ×4-sets Expand runs
    * over the ~15 distinct (status, priority) tuples, not the rows.
    */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    preAggregated(Sources.table(s, dir, "orders"),
      Seq("o_orderstatus", "o_orderpriority"), "o_totalprice")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("pre_n")).as("n_orders"),
        preSumClosed.as("total_price"))

  /** `agg_rollup` — A9, revenue by (region, nation) with ROLLUP
    * subtotals. nation/region are true dims (bounded size at any SF) →
    * explicit broadcast; orders⋈customer is left to AQE, which
    * broadcasts at test scale and sort-merge-joins at 100 TB where
    * customer is billions of rows.
    */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    val orders = Sources.table(s, dir, "orders")
    val customer = Sources.table(s, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val nation = Sources.table(s, dir, "nation")
    val region = Sources.table(s, dir, "region")
    val joined = orders.as("o")
      .join(customer.as("c"), col("o.o_custkey") === col("c.c_custkey"))
      .join(broadcast(nation).as("n"),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .join(broadcast(region).as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .select(col("r.r_name"), col("n.n_name"), col("o.o_totalprice"))
    // Column refs, not names: string-based rollup after a multi-join
    // trips Spark's ambiguous-self-join detection (the Expand node
    // re-exposes the grouping attrs under the same names).
    // Pre-aggregated ([[preAggregated]]): the ×3-sets Expand runs over
    // the ≤25 (region, nation) tuples instead of every order row.
    preAggregated(joined, Seq("r_name", "n_name"), "o_totalprice")
      .rollup(col("r_name"), col("n_name"))
      .agg(preSumClosed.as("revenue"),
        sum(col("pre_n")).as("n_orders"))
  }

  /** `agg_gsets` — explicit GROUPING SETS (the general form rollup and
    * cube specialize): per-status subtotals, per-priority subtotals,
    * and the grand total in ONE scan. Plans as a single Expand-fed
    * hash aggregate — one pass over the fact table replaces three
    * separate group-bys, the multi-report shape of the reference's
    * quality summaries (/root/reference/src/etl_2022.py:46-109) done
    * the warehouse way.
    */
  def aggGsets(s: SparkSession, dir: String): DataFrame =
    preAggregated(Sources.table(s, dir, "orders"),
      Seq("o_orderstatus", "o_orderpriority"), "o_totalprice")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("pre_n")).as("n_orders"),
        preSumClosed.as("total_price"))

  /** `agg_hist` — fixed-width value histogram over `events.value`
    * (width-50 buckets): the profiling primitive behind distribution
    * dashboards and drift checks. Bucket id is an explicit
    * `floor(value / width)` — floor on BOTH engine and oracle sides,
    * because the obvious `CAST(value / width AS BIGINT)` ROUNDS in
    * DuckDB while Spark's cast truncates. One narrow projection into a
    * hash aggregate; shuffle rows = bucket count, bounded by the value
    * range at any corpus size.
    */
  def aggHist(s: SparkSession, dir: String, width: Double = 50.0): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    Sources.table(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(floor(col("value") / width).cast(LongType).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
  }

  /** Profile drift between two snapshots: join two [[aggProfile]]-shaped
    * relations on `col_name` and emit per-metric relative deltas plus a
    * drift verdict — the monitoring primitive behind "did this batch
    * change the data distribution" checks (the alerting analog of the
    * reference's threshold rules, /root/reference/src/etl_2022.py:111-121,
    * applied across snapshots instead of within one). Inputs are tiny
    * (one row per profiled column), so the join broadcasts; the
    * expensive part is the upstream profiles, each one scan.
    */
  def profileDrift(before: DataFrame, after: DataFrame,
                   relThreshold: Double = 0.1): DataFrame = {
    require(relThreshold > 0, s"threshold must be positive, got $relThreshold")
    def rel(m: String): Column =
      abs(col(s"a_$m") - col(s"b_$m")) /
        greatest(abs(col(s"b_$m")), lit(1e-12))
    val b = before.select(col("col_name"), col("mean").as("b_mean"),
      col("median").as("b_median"), col("std").as("b_std"))
    val a = after.select(col("col_name"), col("mean").as("a_mean"),
      col("median").as("a_median"), col("std").as("a_std"))
    b.join(a, "col_name")
      .select(col("col_name"),
        round(rel("mean"), 4).as("mean_drift"),
        round(rel("median"), 4).as("median_drift"),
        round(rel("std"), 4).as("std_drift"))
      .withColumn("drifted",
        col("mean_drift") > relThreshold ||
          col("median_drift") > relThreshold ||
          col("std_drift") > relThreshold)
  }

  /** `agg_skew` — distribution-shape statistics per return flag:
    * population skewness and excess kurtosis of `l_quantity`, derived
    * from exact decimal power sums (Σx … Σx⁴) like [[aggCorr]] — the
    * built-in `skewness`/`kurtosis` aggregates accumulate central
    * moments in shuffle-arrival order, so their last bits drift
    * run-to-run; power sums are order-independent and the moment
    * arithmetic then runs on bit-identical doubles in both engines.
    * Bounded column on purpose: quantity ≤ 50 keeps x⁴ (≤ 6.25e6)
    * well inside DECIMAL(18,6); a price-scale column would need a
    * wider decimal.
    */
  def aggSkew(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val n = col("n").cast(DoubleType)
    val mu = col("sx") / n
    val m2 = col("sxx") / n - mu * mu
    val m3 = col("sxxx") / n - lit(3.0) * mu * (col("sxx") / n) +
      lit(2.0) * mu * mu * mu
    val m4 = col("sxxxx") / n - lit(4.0) * mu * (col("sxxx") / n) +
      lit(6.0) * mu * mu * (col("sxx") / n) - lit(3.0) * mu * mu * mu * mu
    // r13: quantity is integer-valued, so all four power sums are
    // plain LONG sums of exact integer units (x⁴ ≤ 6.25e6/row —
    // headroom past 10¹² rows/group); bit-identical to the old
    // DECIMAL(18,6) spelling, primitive codegen instead of BigDecimal.
    val xu = units(x, 0)
    Sources.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        fromUnits(sum(xu), 0).as("sx"),
        fromUnits(sum(xu * xu), 0).as("sxx"),
        fromUnits(sum(xu * xu * xu), 0).as("sxxx"),
        fromUnits(sum(xu * xu * xu * xu), 0).as("sxxxx"))
      .select(col("l_returnflag"), col("n"),
        round(mu, 4).as("mean_qty"),
        round(m3 / pow(m2, 1.5), 4).as("skew_pop"),
        round(m4 / (m2 * m2) - lit(3.0), 4).as("kurt_excess"))
  }

  /** `agg_deciles` — the exact decile grid of `events.value`: one
    * ordered statistic per 10% step, the distribution summary quality
    * dashboards plot. Exact `percentile` over the full column (the
    * oracle-mandated form; at 100 TB the same plan swaps to
    * `approx_percentile` sketches — see [[aggProfileApprox]]); the
    * nine cut points come back as one array, exploded to rows. Both
    * engines interpolate linearly and the comparison rounds to 4 dp.
    */
  def aggDeciles(s: SparkSession, dir: String): DataFrame = {
    val ps = (1 to 9).map(_ / 10.0)
    Sources.table(s, dir, "events")
      .agg(percentile(col("value"),
        array(ps.map(lit): _*)).as("qs"))
      .select(posexplode(col("qs")).as(Seq("idx", "q")))
      .select(((col("idx") + 1) / lit(10.0)).as("p"),
        round(col("q"), 4).as("value_at_p"))
  }

  /** `agg_mode` — per-group modal value bucket: the most frequent
    * width-10 `value` bucket per event type, ties broken by the lower
    * bucket. The categorical-distribution profiling primitive ("what's
    * the typical value range per type"). Two hash aggregates (bucket
    * counts, then a per-group top-1 via row_number over a window keyed
    * on the group) — shuffle rows bounded by distinct (type, bucket)
    * pairs, and the window partitions by event_type so the top-1 pass
    * scales with group count, never input rows. The explicit
    * (count DESC, bucket) ordering is what makes mode deterministic —
    * a bare `mode()` aggregate leaves ties engine-dependent.
    */
  def aggMode(s: SparkSession, dir: String, width: Double = 10.0): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val top1 = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("bucket"))
    Sources.table(s, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        floor(col("value") / width).cast(LongType).as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(top1))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("bucket").as("mode_bucket"), col("n"))
  }

  /** `agg_minmax_by` — deterministic arg-max/arg-min per group: the
    * event id carrying the highest (and lowest) value per event type.
    * Spark's `max_by(id, value)` is the idiomatic spelling but leaves
    * ties engine-arbitrary (and the events table HAS duplicate
    * (type, value) pairs); lexicographic (value, id) min/max is the
    * same single-pass aggregate with the tie-break pinned. DuckDB
    * mirrors it with `max({'v': value, 'id': event_id})`.
    *
    * Plan (r13): the (value, id) pair aggregates as ONE packed
    * DECIMAL(38,0) via [[graft.ops.Num.packAsc]] — the rank is
    * [[graft.functions.DoubleOrderBits]] shifted into non-negative
    * range by an UNCONDITIONAL `+ 2⁶³` (the bits are already in
    * signed total order; a conditional unsigned reinterpretation
    * would flip negatives ABOVE positives — the code-review bug this
    * comment memorializes; the crafted-negatives spec pins it) —
    * NOT as `min/max(struct(...))`: struct buffers are not
    * hash-aggregable, so the struct form silently planned as a
    * SortAggregate that sorted the fact table in both partials.
    * Decimal min/max is an ordinary HashAggregate buffer: map-side
    * combined, one row per group on the shuffle, no sort. The
    * packing is exact (the bit image is a bijection and
    * 2⁶⁴·2⁶² < 10³⁸ — inside Num.packAsc's proved rank bound
    * ⌊(10³⁸−2⁶²)/2⁶²⌋ > 2⁶⁴); both the rank and the id are
    * `raise_error`-guarded in Num. The plain min/max(value) ride along in the same
    * aggregate for the output columns (by construction the packed
    * argmax carries exactly that value).
    */
  def aggMinmaxBy(s: SparkSession, dir: String): DataFrame =
    aggMinmaxBy(s, Sources.table(s, dir, "events"))

  /** [[aggMinmaxBy]] over any
    * `(event_id, event_type, value)` relation.
    */
  def aggMinmaxBy(s: SparkSession, events: DataFrame): DataFrame = {
    val twoTo63 = "CAST('9223372036854775808' AS DECIMAL(19,0))"
    graft.functions.VectorFunctions.registerDbits(s)
    val ub = expr(s"CAST(graft_dbits(value) AS DECIMAL(20,0)) + $twoTo63")
    events
      .filter(col("value").isNotNull && col("event_type").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_type"), col("value"),
        graft.ops.Num.packAsc(ub, col("event_id"), "agg_minmax_by")
          .as("packed"))
      .groupBy("event_type")
      .agg(max(col("packed")).as("pmx"), min(col("packed")).as("pmn"),
        max(col("value")).as("vmx"), min(col("value")).as("vmn"))
      .select(col("event_type"),
        graft.ops.Num.unpackIdAsc(col("pmx")).as("max_value_event"),
        round(col("vmx"), 4).as("max_value"),
        graft.ops.Num.unpackIdAsc(col("pmn")).as("min_value_event"),
        round(col("vmn"), 4).as("min_value"))
  }

  /** `agg_pctl_group` — exact quartiles per group (the per-segment
    * distribution summary behind SLO/quality dashboards): Q1/median/Q3
    * of `value` for each event type, one row per (group, p). One
    * grouped `percentile` aggregate returns all three cut points as an
    * array, exploded to rows — a single shuffle keyed on the group.
    * Exact ordered statistics (the oracle-checkable form; the 100 TB
    * swap is `approx_percentile`, see [[aggProfileApprox]]).
    */
  def aggPctlGroup(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75)
    Sources.table(s, dir, "events")
      .filter(col("event_type").isNotNull)
      .groupBy("event_type")
      .agg(percentile(col("value"), array(ps.map(lit): _*)).as("qs"))
      .select(col("event_type"), posexplode(col("qs")).as(Seq("idx", "q")))
      .select(col("event_type"),
        ((col("idx") + 1) * lit(25) / lit(100.0)).as("p"),
        round(col("q"), 4).as("value_at_p"))
  }

  /** `freq_items` — approximate heavy hitters over `event_type` and
    * the width-50 value bucket, via Spark's `stat.freqItems`
    * (Karp-Papadimitriou-Shenker counting: one pass, bounded memory,
    * guaranteed SUPERSET of everything above the support threshold —
    * false positives possible, false negatives not). The sketch-family
    * sibling of HLL distinct counts, t-digest quantiles, and the Bloom
    * membership filter; the exact baselines are `agg_having` /
    * `agg_mode`. NO ORACLE (sketch contents are engine-specific); the
    * unit spec asserts the superset guarantee against exact counts,
    * and [[freqItemsPortable]] is the oracle-checked EXACT twin the
    * sketch must superset (r18 — the bloom/minhash twin pattern).
    * Output: one row per column with the sorted frequent-item list
    * rendered as a string.
    */
  def freqItems(s: SparkSession, dir: String,
                support: Double = 0.1): DataFrame = {
    val prepared = Sources.table(s, dir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / 50.0).cast(LongType).as("bucket"))
    val fi = prepared.stat.freqItems(Seq("event_type", "bucket"), support)
    fi.select(
      concat_ws(",", sort_array(col("event_type_freqItems"))).as("freq_types"),
      concat_ws(",", sort_array(col("bucket_freqItems"))
        .cast(ArrayType(StringType))).as("freq_buckets"))
  }

  /** `freq_items_portable` — the ORACLE TWIN for [[freqItems]]'s
    * semantics: the EXACT heavy hitters above the same support
    * threshold (`count > support·N` over the same filtered
    * (event_type, width-50 bucket) relation), rendered in the same
    * sorted-comma-list shape. The KPS sketch guarantees a SUPERSET of
    * exactly this set, so the pair (sketch rows-only + exact twin
    * oracle + the superset unit in SketchSpec's family) pins the
    * production query's semantics without pretending sketch contents
    * are portable. Plan: two map-side-combined hash aggregates (per
    * type, per bucket) against a 1-row broadcast total — no sketch,
    * no driver state; at 100 TB the aggregate is bounded by the
    * distinct type/bucket counts. `concat_ws` over an empty list and
    * the oracle's `coalesce(string_agg, '')` both render "no frequent
    * items" as the empty string, so the boundary case hash-matches.
    */
  def freqItemsPortable(s: SparkSession, dir: String,
                        support: Double = 0.1): DataFrame = {
    val prepared = Sources.table(s, dir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / 50.0).cast(LongType).as("bucket"))
    val tot = prepared.agg(count(lit(1)).as("n"))
    def frequent(key: String): DataFrame =
      prepared.groupBy(key).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(tot))
        .filter(col("c") > col("n") * support)
    val types = frequent("event_type")
      .agg(concat_ws(",", sort_array(collect_list(col("event_type"))))
        .as("freq_types"))
    val buckets = frequent("bucket")
      .agg(concat_ws(",", sort_array(collect_list(col("bucket")))
        .cast(ArrayType(StringType))).as("freq_buckets"))
    types.crossJoin(buckets)
  }

  /** `agg_grouping_id` — rollup with explicit `grouping()` flags: the
    * subtotal rows carry a marker distinguishing "NULL because this
    * level is rolled up" from "NULL in the data" — the disambiguation
    * every warehouse report needs once group columns are nullable.
    * Pre-aggregated like [[aggRollup]] ([[preAggregated]]); the
    * flags are free metadata from the (now tiny) Expand.
    */
  def aggGroupingId(s: SparkSession, dir: String): DataFrame =
    preCounted(Sources.table(s, dir, "orders"),
      Seq("o_orderstatus", "o_orderpriority"))
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast(LongType).as("g_status"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_priority"),
        sum(col("pre_n")).as("n"))

  /** `trend_mom` — month-over-month revenue trend: monthly decimal-
    * exact revenue plus the percent change against the previous month.
    * The heavy work is one grouped aggregate (shuffle rows = months);
    * the lag window then runs over the bounded month series, so its
    * single-partition sort is a non-issue at any corpus size — the
    * standard shape for trend reporting over pre-aggregated series.
    */
  def trendMom(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("ym")
    Sources.table(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      // r15: hi/lo long-unit sum (price exactly 2 dp; same exact
      // rational as dsum → bit-identical revenue) — monthly groups
      // are corpus-sized, so the split accumulator's 2^32 extra
      // headroom matters and both partial sums stay primitive
      .agg(lsumWide(col("o_totalprice"), 2).as("revenue"))
      .select(col("ym"), col("revenue"),
        round(lit(100.0) * (col("revenue") - lag(col("revenue"), 1).over(w)) /
          lag(col("revenue"), 1).over(w), 4).as("pct_change"))
  }

  /** `agg_collect` — grouped collection aggregate: the distinct
    * width-100 value buckets per event type as one sorted,
    * comma-joined string. `collect_set` is the order-nondeterministic
    * primitive — `sort_array` immediately after is what makes the
    * result (and any downstream hash) stable, and the string render
    * keeps the comparison engine-portable. Collection aggregates ship
    * every element through the shuffle: safe here because the bucket
    * domain is bounded (≤ value-range/width elements per group);
    * unbounded-cardinality collects at 100 TB should aggregate first.
    */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / 100.0).cast(LongType).as("bucket"))
      .groupBy("event_type")
      .agg(concat_ws(",",
        sort_array(collect_set(col("bucket"))).cast(ArrayType(StringType)))
        .as("buckets"))

  /** `agg_corr` — bivariate statistics per return flag: sample
    * covariance, Pearson correlation, and the OLS slope of price on
    * quantity. Computed from exact decimal power sums (Σx, Σy, Σxy,
    * Σx², Σy² via [[Num.dsum]]) rather than the built-in
    * `corr`/`covar_samp`/`regr_slope` aggregates: the built-ins
    * accumulate co-moments in shuffle-arrival order, so their last
    * bits vary run-to-run and engine-to-engine, while decimal sums are
    * order-independent and bit-identical in DuckDB — the engine's
    * sum-determinism discipline extended to second moments. One hash
    * aggregate, map-side combined; the moment arithmetic is a per-group
    * projection.
    */
  def aggCorr(s: SparkSession, dir: String): DataFrame = {
    // r13: power sums as LONG unit sums (quantity is integer, price
    // exactly 2 dp — [[Num.units]] exactness contract), products in
    // integer unit space so x·y, x², y² are exact by construction;
    // the oracle mirrors the same integer-cents arithmetic (the old
    // double-product-then-DECIMAL(18,6) spelling rounds fl(y·y) whose
    // error ~1.2e-6 can cross a 6-dp boundary, so exact and rounded
    // sums genuinely differ pre-round). Σ(y²) units (~10¹⁴/row)
    // overflow a long already at ~10⁵ rows/group, so that one sum runs
    // as the [[Num.unitsHi]]/[[Num.unitsLo]] split accumulator — two
    // primitive long sums recombined exactly per group.
    // r14: the enforced units round-trip guard is paid ONCE per
    // column by projecting the checked units first — the power-term
    // products then reference plain long attributes (re-deriving the
    // guarded expression per term measured +47% on this query)
    val xu = col("xu")
    val yc = col("yc")
    val yy = yc * yc // scale 4, ≥ 0
    val n = col("n").cast(DoubleType)
    Sources.table(s, dir, "lineitem")
      .select(col("l_returnflag"),
        units(col("l_quantity"), 0).as("xu"),
        units(col("l_extendedprice"), 2).as("yc"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        fromUnits(sum(xu), 0).as("sx"), fromUnits(sum(yc), 2).as("sy"),
        fromUnits(sum(xu * yc), 2).as("sxy"),
        fromUnits(sum(xu * xu), 0).as("sxx"),
        fromUnitsHiLo(sum(unitsHi(yy)), sum(unitsLo(yy)), 4).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("sxy") - col("sx") * col("sy") / n) / (n - 1), 2)
          .as("qp_covar"),
        round((n * col("sxy") - col("sx") * col("sy")) /
          (sqrt(n * col("sxx") - col("sx") * col("sx")) *
            sqrt(n * col("syy") - col("sy") * col("sy"))), 4)
          .as("qp_corr"),
        round((n * col("sxy") - col("sx") * col("sy")) /
          (n * col("sxx") - col("sx") * col("sx")), 4)
          .as("price_per_qty"))
  }

  /** `agg_weighted` — quantity-weighted mean price per return flag,
    * next to the plain mean it corrects: the aggregate that answers
    * "what did a UNIT actually cost" when line sizes vary. Both
    * numerator and denominator are exact decimal sums ([[Num.dsum]]):
    * price (2 dp) × quantity (integer-valued) stays inside scale-4
    * exactly, so the final double division is bit-identical in both
    * engines. One map-side-combined hash aggregate.
    */
  def aggWeighted(s: SparkSession, dir: String): DataFrame = {
    // r13: long unit sums (see [[aggGroup]]) — price·qty multiplies in
    // integer unit space (cents × integer quantity, ≤ 5.25e8/row →
    // safe past 10¹⁰ rows/group), exact by construction.
    val xu = units(col("l_quantity"), 0)
    val yc = units(col("l_extendedprice"), 2)
    Sources.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(fromUnits(sum(yc * xu), 2).as("swx"),
        fromUnits(sum(xu), 0).as("sw"),
        fromUnits(sum(yc), 2).as("sx"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(col("swx") / col("sw"), 4).as("wavg_price"),
        round(col("sx") / col("n").cast(DoubleType), 4).as("avg_price"))
  }

  /** `agg_listagg` — ordered string aggregation (LISTAGG / string_agg
    * with ORDER BY): the distinct order priorities per status as one
    * sorted CSV cell, the classic report-formatting aggregate.
    * `collect_set` → `sort_array` → `concat_ws` rather than relying on
    * any engine's LISTAGG ordering guarantees: the sort happens on the
    * collected array AFTER aggregation, so shuffle arrival order can't
    * leak into the cell. Distinct set sizes are vocabulary-bounded
    * (five priorities), so the per-group array is bytes even when the
    * group has billions of rows.
    */
  def aggListagg(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
        .as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))

  /** `agg_salted` — explicit two-phase salted aggregation over the
    * skew-prone low-cardinality key `event_type`: phase 1 groups on
    * (key, salt = event_id mod 16) so a hot key's rows spread across
    * 16 reducers; phase 2 combines the ≤16 partials per key. The
    * ORACLE is the plain one-phase GROUP BY — the whole point is that
    * salting is semantics-preserving (counts add; decimal sums are
    * exact and associative, the [[graft.ops.Num.dsum]] discipline —
    * raw double sums would NOT survive the re-association).
    *
    * At 100 TB this is the escape hatch when one key holds 30% of all
    * rows and a single reducer would spill for hours while 999
    * executors idle. Spark's own map-side partial aggregation usually
    * makes manual salting unnecessary for algebraic aggregates — and
    * AQE skew-join handles the join case — but partial aggregation
    * degrades exactly when the per-task key-group count overflows the
    * hash map (high-cardinality compound keys), and salting also
    * covers non-algebraic aggregates (exact percentiles,
    * collect_list) where no map-side combine exists. Phase-2 input is
    * |keys| × 16 rows — negligible at any scale.
    *
    * INPUT CONTRACT (r17 ADVICE, surfaced at the operator level): the
    * exact sum rides [[Num.units]] at scale 4 — the old DECIMAL(18,4)
    * semantics — so a `value` NOT exactly representable at 4 dp
    * RAISES at runtime (the units round-trip guard) where the decimal
    * cast it replaced silently rounded. That loudness is deliberate
    * (a silently-rounded "exact" sum is the worst failure mode a
    * correctness-graded aggregate can have), but it means one
    * out-of-contract double in `events.value` fails the stage on real
    * ingest data; an ingest-facing caller that WANTS the old silent
    * rounding swaps the unit sum for [[Num.dsum]] — one expression,
    * same plan shape. The same contract applies everywhere the
    * long-unit forms run: [[preAggregated]] (cube/rollup/gsets, scale
    * 2), the window sums on [[Num.lsumOver]]
    * ([[graft.ops.TimeOps.windowRange]],
    * [[graft.ops.Relational.windowRunning]]/`windowFrames`), and the
    * flagship [[aggGroup]].
    */
  def aggSalted(s: SparkSession, dir: String): DataFrame = {
    // r18: phase-1 partials on the BALANCED 11-bit unit split (see
    // [[Num.unitsLo]]): scale-4 units of the ≤300-bounded metric sit
    // under 2²², so splitting at ~half the magnitude bounds both
    // half-sums by n·2¹¹ — exact by construction to ~4.5·10¹⁵ rows
    // per (key, salt) group, vs ~3·10¹² for the single long sum (the
    // r17 form, whose margin at a 100 TB hot key was only ~5×).
    // Exact DECIMAL(38,0) re-sum over the ≤ |types|·16 phase-2 rows;
    // bit-identical to the one-level decimal spelling.
    val u = units(col("value"), 4)
    val bits = 11
    Sources.table(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16L)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(Num.unitsHi(u, bits)).as("pv_uh"),
        sum(Num.unitsLo(u, bits)).as("pv_ul"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n_events"),
        round(Num.fromUnitsHiLo(
          sum(col("pv_uh").cast(DecimalType(38, 0))),
          sum(col("pv_ul").cast(DecimalType(38, 0))), 4, bits), 4)
          .as("sum_value"))
  }
}
