package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch as a custom
  * `TypedImperativeAggregate` — the SURVEY §2.9 "custom aggregation"
  * extension point taken past `Fold`s: a mergeable fixed-size state
  * (2^p byte registers) that aggregates partially map-side, merges
  * across partitions in any order, and evaluates to the classic HLL
  * estimate (Flajolet et al. 2007, with the small-range linear-counting
  * correction; no HLL++ bias tables — documented approximation).
  *
  * Determinism by construction (what makes an EXACT cross-engine oracle
  * possible for an "approximate" aggregate):
  *   - value hashing is Spark's own XXH64 (seed 42) — emulated in DuckDB
  *     by [[graft.queries.OracleSql]];
  *   - registers are integer maxima — order-free;
  *   - the harmonic sum is computed as an INTEGER numerator
  *     sum(2^(CAP-reg)) / 2^CAP, so no floating addition order exists;
  *     the single BigInt->double conversion is correctly rounded in both
  *     engines, and the remaining float ops are one multiply + divide.
  *
  * At 100 TB: constant 256-byte state per group per task, one partial
  * per partition, merge is elementwise max — the canonical distributed
  * sketch shape (contrast: exact count_distinct shuffles every value).
  */
case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  import HllDistinct._

  override def inputTypes = Seq(LongType) // AbstractDataType is private[sql] in Spark 4
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)

  override def update(buf: Array[Int], row: InternalRow): Array[Int] = {
    val v = child.eval(row)
    if (v != null) {
      val h = XXH64.hashLong(v.asInstanceOf[Long], SketchUtil.SparkSeed)
      val idx = (h & (M - 1)).toInt
      val w = h >>> P
      val rho = if (w == 0L) RhoCap else java.lang.Long.numberOfLeadingZeros(w) - P + 1
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = HllOps.estimate(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = buf(i).toByte; i += 1 } // rho <= 57 fits a byte
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = bytes(i).toInt; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

object HllDistinct {
  /** precision bits: 2^8 = 256 registers (~6.5% standard error). */
  final val P = 8
  final val M = 1 << P
  /** max rho: leading zeros of the (64-P)-bit suffix, + 1. */
  final val RhoCap = 64 - P + 1
  /** alpha_m * m^2 for m=256 (Flajolet et al. 2007, public constants). */
  final val AlphaMM: Double = 0.7213 / (1.0 + 1.079 / M) * M * M
  /** 2^RhoCap as an exact double. */
  final val Pow2Cap: Double = java.lang.Math.scalb(1.0, RhoCap)

  /** Column entry point: `hllDistinct(col)` in `groupBy(...).agg(...)`. */
  def apply(c: Column): Column =
    ColumnBridge.column(
      HllDistinct(ColumnBridge.expression(c)).toAggregateExpression())
}

/** Shared register-state operations for the HLL family. The register
  * array is the WHOLE algebra: update is a per-index max against the
  * value's rho, merge is an elementwise max (associative, commutative,
  * idempotent), and the estimate is a pure function of the registers —
  * which is why a PERSISTED sketch ([[HllSketch]]) unioned later
  * ([[HllUnion]]) is bit-identical to aggregating the raw values
  * directly, with no approximation drift across checkpoints. */
private[expressions] object HllOps {
  import HllDistinct._

  def updateLong(buf: Array[Int], value: Long): Unit = {
    val h = XXH64.hashLong(value, SketchUtil.SparkSeed)
    val idx = (h & (M - 1)).toInt
    val w = h >>> P
    val rho = if (w == 0L) RhoCap else java.lang.Long.numberOfLeadingZeros(w) - P + 1
    if (rho > buf(idx)) buf(idx) = rho
  }

  def mergeInto(a: Array[Int], b: Array[Int]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  def mergeBytesInto(a: Array[Int], bytes: Array[Byte]): Unit = {
    require(bytes.length == M,
      s"hll sketch must be $M bytes, got ${bytes.length}")
    var i = 0
    while (i < M) { val v = bytes(i).toInt; if (v > a(i)) a(i) = v; i += 1 }
  }

  def toBytes(buf: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = buf(i).toByte; i += 1 } // rho <= 57 fits a byte
    out
  }

  def fromBytes(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = bytes(i).toInt; i += 1 }
    out
  }

  def estimate(buf: Array[Int]): Double = {
    // integer harmonic numerator: sum of 2^(RhoCap - reg) — order-free
    var num = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < M) {
      if (buf(i) == 0) zeros += 1
      num += BigInt(1) << (RhoCap - buf(i))
      i += 1
    }
    val raw = AlphaMM * Pow2Cap / num.toDouble
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    // 6 dp: absorbs the only non-correctly-rounded op (ln) cross-engine
    math.rint(e * 1e6) / 1e6
  }
}

/** The PERSISTABLE face of [[HllDistinct]]: same registers, but eval
  * returns the 256 raw register BYTES instead of the estimate — the
  * mergeable state a 100 TB pipeline checkpoints. Write one sketch row
  * per (group, ingest batch); [[HllUnion]] + [[HllEstimate]] then answer
  * distinct-count questions over ANY batch subset without rescanning a
  * single raw value. Registers are maxima, so the bytes are
  * deterministic — independent of partitioning, merge order and row
  * order — and sketch-then-union is EXACTLY the direct aggregate
  * (pinned in HllSpec). */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  import HllDistinct._

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)
  override def update(buf: Array[Int], row: InternalRow): Array[Int] = {
    val v = child.eval(row)
    if (v != null) HllOps.updateLong(buf, v.asInstanceOf[Long])
    buf
  }
  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    HllOps.mergeInto(a, b); a
  }
  override def eval(buf: Array[Int]): Any = HllOps.toBytes(buf)
  override def serialize(buf: Array[Int]): Array[Byte] = HllOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Int] = HllOps.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  def apply(c: Column): Column =
    ColumnBridge.column(
      HllSketch(ColumnBridge.expression(c)).toAggregateExpression())
}

/** Union aggregate over PERSISTED [[HllSketch]] bytes: elementwise
  * register max — associative, commutative, idempotent (re-unioning the
  * same sketch is a no-op, so replayed ingest batches cannot inflate
  * the count). Null sketches are skipped; a malformed length is a hard
  * error, not a silent wrong answer. */
case class HllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  import HllDistinct._

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_union"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)
  override def update(buf: Array[Int], row: InternalRow): Array[Int] = {
    val v = child.eval(row)
    if (v != null) HllOps.mergeBytesInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }
  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    HllOps.mergeInto(a, b); a
  }
  override def eval(buf: Array[Int]): Any = HllOps.toBytes(buf)
  override def serialize(buf: Array[Int]): Array[Byte] = HllOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Int] = HllOps.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllUnion =
    copy(child = newChild)
}

object HllUnion {
  def apply(c: Column): Column =
    ColumnBridge.column(
      HllUnion(ColumnBridge.expression(c)).toAggregateExpression())
}

/** Scalar estimate over [[HllSketch]]/[[HllUnion]] bytes — the same
  * formula as [[HllDistinct]].eval, so
  * `hll_estimate(hll_union(sketch)) == hll_distinct(raw values)`
  * EXACTLY (same registers in, same double out). */
case class HllEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_estimate"
  override def nullSafeEval(input: Any): Any =
    HllOps.estimate(HllOps.fromBytes(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HllOps.estimate(" +
        s"graft.functions.expressions.HllOps.fromBytes($c))")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllEstimate {
  def apply(c: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(c)))
}
