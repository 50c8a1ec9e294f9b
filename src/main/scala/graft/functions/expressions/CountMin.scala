package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a custom
  * `TypedImperativeAggregate` — the frequency-estimation companion to
  * [[HllDistinct]]: D x W long counters (D=4 rows, W=512 buckets, 16 KB)
  * that aggregate partially map-side, merge across partitions by
  * elementwise addition (order-free), and answer point-frequency queries
  * with one-sided error (estimate >= true count, always).
  *
  * Determinism by construction — the same property that gives the HLL
  * aggregate an EXACT cross-engine oracle:
  *   - row r hashes with Spark's own XXH64 at seed 42+r (emulated
  *     bit-for-bit in DuckDB by [[graft.queries.OracleSql.xxh64Long]]);
  *   - W is a power of two, so the bucket is a low-bit mask == the
  *     unsigned modulus the oracle computes;
  *   - counters are integer sums — no float, no order sensitivity.
  *
  * At 100 TB: constant 16 KB of mergeable state per group per task — the
  * heavy-hitters pattern is ONE aggregation pass to build the sketch,
  * then a broadcast of those 16 KB to probe candidate keys, instead of
  * shuffling every raw value. Contrast an exact global top-k by count,
  * which shuffles all (key, 1) pairs (fine for keyed data, fatal when the
  * key cardinality itself is the problem).
  */
case class CmsSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  import CountMin._

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var r = 0
      while (r < D) {
        val h = XXH64.hashLong(x, SketchUtil.SparkSeed + r)
        buf(r * W + (h & (W - 1)).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(D * W * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](D * W)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

/** `cms_estimate(sketch, value) -> long`: min over the D rows of the
  * value's counter — the classic CMS point query. Codegen'd static call
  * so probing stays inside whole-stage codegen. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, v: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[ArrayData], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = graft.functions.expressions.CountMin.estimate($s, $v);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

/** Union aggregate over PERSISTED [[CmsSketch]] states (the
  * `array<long>` a sketch table stores): elementwise counter ADDITION —
  * associative and commutative, so any merge tree over any batch
  * subset lands on the same counters as one direct aggregate (pinned
  * in CmsSpec, parquet round-trip included). NOT idempotent: counters
  * are sums, so a replayed ingest batch double-counts — persist
  * per-batch sketch rows through an exactly-once committed-directory
  * pattern ([[graft.streaming.EventStreams.corpusStatsSink]]'s `b_N` +
  * `_SUCCESS` discipline), unlike the HLL/Bloom unions whose max/OR
  * merges absorb replays on their own. */
case class CmsUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  import CountMin._

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_union"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == D * W,
        s"cms sketch must have ${D * W} counters, got ${arr.numElements()}")
      var i = 0
      while (i < D * W) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(D * W * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](D * W)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnion =
    copy(child = newChild)
}

object CmsUnion {
  def apply(c: Column): Column =
    ColumnBridge.column(
      CmsUnion(ColumnBridge.expression(c)).toAggregateExpression())
}

object CountMin {
  /** depth: independent hash rows (error probability ~ e^-D). */
  final val D = 4
  /** width: buckets per row, power of two (overcount ~ 2n/W per row). */
  final val W = 512

  def estimate(sketch: ArrayData, v: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < D) {
      val h = XXH64.hashLong(v, SketchUtil.SparkSeed + r)
      val c = sketch.getLong(r * W + (h & (W - 1)).toInt)
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** `cmsSketch(col)` in an `agg(...)`. */
  def sketch(c: Column): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(c)).toAggregateExpression())

  /** `cmsEstimate(sketchCol, valueCol)` point query. */
  def estimate(sketch: Column, v: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(v)))
}
