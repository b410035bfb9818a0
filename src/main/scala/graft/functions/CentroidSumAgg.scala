package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-centroid component sums for one Lloyd round, fused into a
  * single global aggregate: for every input row `(cid, v, mat, kk,
  * d)` the update folds `v`'s components into per-slot decimal sums
  * (`slot = cid * d + dim`) and per-slot row counts, and the final
  * eval emits ONE row `struct(old, kk, d, sums, cnts)` carrying the
  * round's raw statistics next to the matrix frame it came from.
  *
  * This replaces the `posexplode(v)` → `groupBy(cid, dim)` →
  * `agg(sum(cast(x as decimal(28,12))) / count(1))` →
  * `agg(collect_list(...))` spelling in the chained trainer
  * ([[graft.ops.Cluster]]), with three structural wins measured in
  * r21 (guide §2.3/§2.4: aggregate before you shuffle, remove
  * exchanges):
  *
  *   - no N·d row explosion: the fold indexes a flat array instead of
  *     materializing one row per (vector, dimension) and hash-probing
  *     a (cid, dim) aggregate map;
  *   - one exchange per round instead of two (the (cid, dim) hash
  *     shuffle and the pack-stage global collect_list collapse into
  *     this aggregate's single partial → final merge);
  *   - the matrix frame is referenced ONCE per round (the buffer
  *     captures `mat`/`kk`/`d` from the constant cartesian side), so
  *     the chained plan grows LINEARLY with rounds instead of
  *     doubling per round — the 2^iters tree that forced segmented
  *     chaining in r20.
  *
  * Bit-parity with the spelling it replaces (pinned by
  * KmeansChainSpec chained-vs-legacy and a dedicated parity test):
  *
  *   - each component is cast exactly like `cast(x as decimal(28,12))`
  *     — `Decimal(x).toPrecision(28, 12)` (HALF_UP), with the
  *     session's ANSI flag captured at plan time governing
  *     overflow-throw vs overflow-null;
  *   - per-slot sums accumulate in java BigDecimal at scale 12 —
  *     exact, order-independent arithmetic, so any partial/merge
  *     schedule reproduces the sequential sum bit for bit;
  *   - a null/NaN/±Inf component contributes to the slot COUNT but
  *     not the sum (count(1) counted every exploded row; sum skipped
  *     nulls);
  *   - eval emits sums as decimal(38,12) — `sum` over decimal(28,12)
  *     widens to exactly that type — so the division
  *     `sums[i] / cnts[i]` downstream sees the identical operand
  *     types (decimal(38,12) ÷ bigint) as the old plan's
  *     `sum(...) / count(1)`, and the quotient-to-double cast is the
  *     same Spark expression as before;
  *   - a slot with no finite contribution has a null sum (the old
  *     plan's map value was null there), so the downstream
  *     `coalesce(..., old[i])` fallback fires identically;
  *   - components at dim >= d are ignored (the old spelling's map
  *     keys `cid*d + dim` beyond the matrix were never read back —
  *     they could only collide with other clusters' slots on ragged
  *     garbage the trainer rejects anyway).
  *
  * On EMPTY input eval emits an all-null struct; the trainer's
  * post-agg projection coalesces `kk`/`d` to 0 so the "no healthy
  * vectors" require fires with the same message as before.
  */
case class CentroidSumAgg(cid: Expression, v: Expression,
                          mat: Expression, kk: Expression, d: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CentroidSumAgg.State] {

  // ANSI governs cast-overflow behavior; captured at plan time like
  // any ANSI-aware expression the session builds
  private val ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  override def children: Seq[Expression] = Seq(cid, v, mat, kk, d)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_centroid_sums"

  override def checkInputDataTypes(): TypeCheckResult =
    (cid.dataType, v.dataType, mat.dataType, kk.dataType, d.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_centroid_sums requires (int, array<double>, " +
          s"array<double>, int, int), got $other")
    }

  override def dataType: DataType = CentroidSumAgg.outType

  override def createAggregationBuffer(): CentroidSumAgg.State =
    new CentroidSumAgg.State

  override def update(b: CentroidSumAgg.State,
                      input: InternalRow): CentroidSumAgg.State = {
    val cidV = cid.eval(input)
    val vV = v.eval(input)
    if (cidV == null || vV == null) return b
    if (!b.captured) {
      val kkV = kk.eval(input)
      val dV = d.eval(input)
      val matV = mat.eval(input)
      if (kkV == null || dV == null || matV == null) return b
      b.capture(kkV.asInstanceOf[Int], dV.asInstanceOf[Int],
        matV.asInstanceOf[ArrayData])
    }
    val c = cidV.asInstanceOf[Int]
    val vec = vV.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), b.d)
    if (c >= 0 && c < b.kk) {
      val off = c * b.d
      var i = 0
      while (i < n) {
        b.cnts(off + i) += 1L
        if (!vec.isNullAt(i)) {
          // exact replication of cast(x as decimal(28,12)):
          // Decimal(double) -> changePrecision(28,12) (HALF_UP, the
          // same rounding Cast uses); overflow/NaN/±Inf throws under
          // ANSI (like Cast) and skips otherwise (null into sum =
          // counted but not summed). The isFinite guard (r22, VERDICT
          // r21 #9) is load-bearing: Decimal(NaN) would throw
          // NumberFormatException even under non-ANSI, where Cast
          // yields null — unreachable via the trainer's finite-norm
          // filter but graft_centroid_sums is publicly registered.
          val dbl = vec.getDouble(i)
          val dec = if (java.lang.Double.isFinite(dbl)) Decimal(dbl) else null
          if (dec != null && dec.changePrecision(28, 12)) {
            val s = b.sums(off + i)
            b.sums(off + i) =
              if (s == null) dec.toJavaBigDecimal else s.add(dec.toJavaBigDecimal)
          } else if (ansi) {
            throw new ArithmeticException(
              s"graft_centroid_sums: $dbl cannot be " +
                "represented as Decimal(28, 12)")
          }
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: CentroidSumAgg.State,
                     o: CentroidSumAgg.State): CentroidSumAgg.State = {
    if (!o.captured) return b
    if (!b.captured) return o
    // both sides captured their frame from the same constant cartesian
    // side, so the slot layouts must agree; a mismatch means the input
    // was not partition-constant — fail loudly, never index past
    require(b.kk == o.kk && b.d == o.d,
      s"graft_centroid_sums: partials captured different frames " +
        s"((kk=${b.kk}, d=${b.d}) vs (kk=${o.kk}, d=${o.d})) — the " +
        "matrix frame must be constant across the aggregated input")
    var i = 0
    while (i < b.cnts.length) {
      b.cnts(i) += o.cnts(i)
      if (o.sums(i) != null)
        b.sums(i) =
          if (b.sums(i) == null) o.sums(i) else b.sums(i).add(o.sums(i))
      i += 1
    }
    b
  }

  override def eval(b: CentroidSumAgg.State): Any = {
    if (!b.captured)
      return new GenericInternalRow(Array[Any](null, null, null, null, null))
    val sums = new Array[Any](b.sums.length)
    var i = 0
    while (i < sums.length) {
      if (b.sums(i) != null) {
        // sum over decimal(28,12) widens to decimal(38,12); replicate
        // Sum's overflow rule at that type
        val dec = Decimal(b.sums(i))
        if (dec.changePrecision(38, 12)) sums(i) = dec
        else if (ansi)
          throw new ArithmeticException(
            "graft_centroid_sums: sum overflows Decimal(38, 12)")
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      b.matCopy, b.kk, b.d,
      new GenericArrayData(sums),
      new GenericArrayData(b.cnts.map(Long.box))))
  }

  override def serialize(b: CentroidSumAgg.State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(b.captured)
    if (b.captured) {
      out.writeInt(b.kk); out.writeInt(b.d)
      val m = b.matCopy
      out.writeInt(m.numElements())
      var i = 0
      while (i < m.numElements()) {
        out.writeBoolean(m.isNullAt(i))
        if (!m.isNullAt(i)) out.writeDouble(m.getDouble(i))
        i += 1
      }
      i = 0
      while (i < b.cnts.length) { out.writeLong(b.cnts(i)); i += 1 }
      i = 0
      while (i < b.sums.length) {
        if (b.sums(i) == null) out.writeInt(-1)
        else {
          val bytes = b.sums(i).unscaledValue().toByteArray
          out.writeInt(bytes.length); out.write(bytes)
        }
        i += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CentroidSumAgg.State = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new CentroidSumAgg.State
    if (in.readBoolean()) {
      val kkV = in.readInt(); val dV = in.readInt()
      val mn = in.readInt()
      val m = new Array[Any](mn)
      var i = 0
      while (i < mn) {
        if (!in.readBoolean()) m(i) = in.readDouble()
        i += 1
      }
      b.capture(kkV, dV, new GenericArrayData(m))
      i = 0
      while (i < b.cnts.length) { b.cnts(i) = in.readLong(); i += 1 }
      i = 0
      while (i < b.sums.length) {
        val len = in.readInt()
        if (len >= 0) {
          val arr = new Array[Byte](len)
          in.readFully(arr)
          b.sums(i) = new java.math.BigDecimal(
            new java.math.BigInteger(arr), 12)
        }
        i += 1
      }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CentroidSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CentroidSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CentroidSumAgg =
    copy(cid = c(0), v = c(1), mat = c(2), kk = c(3), d = c(4))
}

object CentroidSumAgg {
  val outType: StructType = StructType(Seq(
    StructField("old", ArrayType(DoubleType)),
    StructField("kk", IntegerType),
    StructField("d", IntegerType),
    StructField("sums", ArrayType(DecimalType(38, 12))),
    StructField("cnts", ArrayType(LongType))))

  /** Mutable per-partition state: the captured (constant) matrix
    * frame and one decimal sum + one row count per `cid * d + dim`
    * slot. BigDecimal at fixed scale 12 stays on java.math's compact
    * long fast path for in-range values and is exact regardless of
    * add order.
    */
  final class State {
    var captured: Boolean = false
    var kk: Int = 0
    var d: Int = 0
    var matCopy: ArrayData = null
    var sums: Array[java.math.BigDecimal] = null
    var cnts: Array[Long] = null
    def capture(kkV: Int, dV: Int, matV: ArrayData): Unit = {
      kk = kkV; d = dV; matCopy = matV.copy()
      val slots = math.max(0, kk * d)
      sums = new Array[java.math.BigDecimal](slots)
      cnts = new Array[Long](slots)
      captured = true
    }
  }
}
