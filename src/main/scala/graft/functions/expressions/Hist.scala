package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-range equi-width histogram as a mergeable sketch — the
  * QUANTILE member of the persisted-sketch family (distinct = HLL,
  * frequency = CMS, membership = Bloom): `bins + 2` long counters
  * (underflow, the bins, overflow) that aggregate map-side, merge by
  * elementwise addition, persist as an `array<long>` column, and
  * answer rank/quantile queries by an integer cumulative walk
  * ([[HistQuantile]]) — no raw value survives the scan, so length/
  * score distribution dashboards over a 100 TB corpus read only
  * sketch rows.
  *
  * Everything is exact integer arithmetic, so the sketch replays
  * bit-for-bit cross-engine: bucket of v = `(v - lo) * bins div
  * (hi - lo)` (truncating; `(hi - lo) <= Long.Max / bins` enforced so
  * the product cannot overflow), counters are sums, and the quantile
  * readout returns the LOWER EDGE of the first bin whose cumulative
  * count exceeds rank `q_ppm * (n - 1) div 1e6` — a deterministic
  * (conservative, sub-bin-width-exact) answer, not an interpolation
  * whose float math could drift. Resolution is the bin width; pick
  * `lo/hi/bins` from domain knowledge (token counts, score ranges),
  * NOT from the data, so sketches from different batches/days stay
  * mergeable forever. */
case class HistSketch(
    child: Expression,
    lo: Long,
    hi: Long,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo; got [$lo,$hi)x$bins")
  require(hi - lo > 0 && (hi - lo) <= Long.MaxValue / bins,
    s"(hi-lo)*bins must fit a long; got [$lo,$hi)x$bins")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hist_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) buf(Hist.bucket(v.asInstanceOf[Long], lo, hi, bins)) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketch =
    copy(child = newChild)
}

/** Union aggregate over PERSISTED [[HistSketch]] arrays: elementwise
  * counter addition — associative/commutative, NOT replay-idempotent
  * (counters, like [[CmsUnion]]; fence replays with exactly-once
  * commits). All inputs must share one length (same lo/hi/bins
  * contract); the first non-null sketch fixes it. */
case class HistUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hist_union"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b.isEmpty) a
    else if (a.isEmpty) b.clone()
    else {
      require(a.length == b.length,
        s"hist sketches must share one binning, got ${a.length} vs ${b.length} counters")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      addInto(buf, arr.toLongArray())
    } else buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = addInto(a, b)
  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistUnion =
    copy(child = newChild)
}

/** `hist_quantile(sketch, q_ppm)` with the lo/hi binning carried by
  * the expression (the sketch stores only counters): the lower edge of
  * the bin holding rank `q_ppm * (n-1) div 1e6`. Null on an empty
  * sketch (n = 0) — there is no quantile of nothing. */
case class HistQuantile(left: Expression, right: Expression, lo: Long, hi: Long)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(sketch: Any, q: Any): Any =
    Hist.quantile(sketch.asInstanceOf[ArrayData].toLongArray(),
      q.asInstanceOf[Long], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, q) => {
      val r = ctx.freshName("hq")
      s"""
         |java.lang.Long $r = graft.functions.expressions.Hist.quantile(
         |  $s.toLongArray(), $q, ${lo}L, ${hi}L);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hist_quantile"
}

object Hist {

  def bucket(v: Long, lo: Long, hi: Long, bins: Int): Int =
    if (v < lo) 0
    else if (v >= hi) bins + 1
    else 1 + ((v - lo) * bins / (hi - lo)).toInt

  /** rank = q_ppm*(n-1) div 1e6; walk the cumulative counts; lower
    * edge of the holding bin (underflow -> lo, overflow -> hi). */
  def quantile(counts: Array[Long], qPpm: Long, lo: Long, hi: Long): java.lang.Long = {
    val bins = counts.length - 2
    var n = 0L
    var i = 0
    while (i < counts.length) { n += counts(i); i += 1 }
    if (n == 0L) return null
    val q = math.max(0L, math.min(1000000L, qPpm))
    val rank = q * (n - 1) / 1000000L
    var cum = 0L
    var b = 0
    while (b < counts.length) {
      cum += counts(b)
      if (cum > rank) {
        return java.lang.Long.valueOf(
          if (b == 0) lo
          else if (b == bins + 1) hi
          else lo + (b - 1).toLong * (hi - lo) / bins)
      }
      b += 1
    }
    java.lang.Long.valueOf(hi) // unreachable: cum == n > rank by then
  }

  def sketch(c: Column, lo: Long, hi: Long, bins: Int): Column =
    ColumnBridge.column(
      HistSketch(ColumnBridge.expression(c), lo, hi, bins).toAggregateExpression())

  def union(c: Column): Column =
    ColumnBridge.column(
      HistUnion(ColumnBridge.expression(c)).toAggregateExpression())

  def quantileOf(sketch: Column, qPpm: Column, lo: Long, hi: Long): Column =
    ColumnBridge.column(
      HistQuantile(ColumnBridge.expression(sketch),
        ColumnBridge.expression(qPpm), lo, hi))

  /** Population Stability Index between two ALIGNED histogram sketches
    * (same lo/hi/bins contract) — the production drift monitor,
    * computed from persisted sketch tables alone: PSI = Σ_bins
    * (pA − pB)·ln(pA/pB) with +0.5 Laplace smoothing per counter (so
    * empty bins never divide by zero and the metric stays finite).
    * Common operating points: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted. Deterministic by the same contract as t12/t14: the sum
    * is a LEFT FOLD in bin order (Spark `aggregate` HOF ≡ DuckDB
    * `list_reduce`), every division/ln on identical doubles — replays
    * exactly cross-engine at 6 dp. Zero shuffle: a pure expression
    * over two array columns. */
  def psi(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{aggregate => fold, _}
    def total(c: Column): Column =
      fold(c, lit(0L), (s, x) => s + x).cast("double")
    val k = size(a).cast("double")
    val na = total(a)
    val nb = total(b)
    val terms = zip_with(a, b, (ca, cb) => {
      val pa = (ca.cast("double") + lit(0.5)) / (na + lit(0.5) * k)
      val pb = (cb.cast("double") + lit(0.5)) / (nb + lit(0.5) * k)
      (pa - pb) * log(pa / pb)
    })
    fold(terms, lit(0.0), (s, x) => s + x)
  }
}
