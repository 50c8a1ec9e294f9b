package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bottom-k consistent sample: the k values whose XXH64 is smallest —
  * a deterministic uniform-without-replacement sample of a group in ONE
  * mergeable pass (the bottom-k / KMV sketch of Cohen & Kaplan 2007,
  * minus the cardinality estimate, which [[HllDistinct]] covers).
  *
  * Why hash-ordered instead of `rand()`-based sampling:
  *   - identical under ANY partitioning and any merge order (max-heap of
  *     hashes — order-free), so a cluster and a laptop draw the SAME
  *     sample — exactly oracle-able;
  *   - CONSISTENT under data growth: adding rows only evicts the largest
  *     hashes, so samples taken at different corpus snapshots overlap
  *     maximally (the property consistent-hashing samplers are built on);
  *   - per-group state is k longs x 2 — group by language and every
  *     stratum carries its own bounded sample at 100 TB.
  *
  * Ties: equal hashes arise only from equal values (64-bit collisions
  * aside), and equal values are interchangeable — the result MULTISET is
  * deterministic. Output: values sorted by their hash (the canonical
  * bottom-k order). */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomK.Heap]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k in [1, 65536], got $k")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"

  override def createAggregationBuffer(): BottomK.Heap = new BottomK.Heap(k)

  override def update(buf: BottomK.Heap, row: InternalRow): BottomK.Heap = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      buf.offer(XXH64.hashLong(x, SketchUtil.SparkSeed), x)
    }
    buf
  }

  override def merge(a: BottomK.Heap, b: BottomK.Heap): BottomK.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.hashes(i), b.values(i)); i += 1 }
    a
  }

  override def eval(buf: BottomK.Heap): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: BottomK.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hashes(i)); bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomK.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BottomK.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}

object BottomK {

  /** Max-heap on the UNSIGNED hash order, capped at k entries: `offer`
    * keeps the k smallest hashes seen. Plain arrays, O(log k) per
    * update, no boxing. */
  final class Heap(k: Int) {
    val hashes = new Array[Long](k)
    val values = new Array[Long](k)
    var size = 0

    private def lt(a: Long, b: Long): Boolean =
      (a ^ Long.MinValue) < (b ^ Long.MinValue) // unsigned compare

    def offer(h: Long, v: Long): Unit = {
      if (size < k) {
        hashes(size) = h; values(size) = v
        size += 1
        var i = size - 1 // sift up
        while (i > 0 && lt(hashes((i - 1) / 2), hashes(i))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (lt(h, hashes(0))) {
        hashes(0) = h; values(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && lt(hashes(m), hashes(l))) m = l
          if (r < size && lt(hashes(m), hashes(r))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val th = hashes(i); hashes(i) = hashes(j); hashes(j) = th
      val tv = values(i); values(i) = values(j); values(j) = tv
    }

    /** values ordered by ascending unsigned hash — the canonical order. */
    def sortedValues: Array[Long] = {
      val idx = (0 until size).sortBy(i => hashes(i) ^ Long.MinValue)
      idx.map(values).toArray
    }
  }

  /** `bottomK(col, k)` in an `agg(...)`. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      BottomK(ColumnBridge.expression(c), k).toAggregateExpression())
}
