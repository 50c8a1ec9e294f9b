package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The T5-style span-corruption kernel ([[graft.operators.Chunking
  * .spanCorrupt]]'s inner pass) as ONE imperative sweep per document:
  * hash-deterministic span starts (Spark's own chained XXH64, so the
  * SQL-side `xxhash64(doc_id, p)` oracle replays it bit-for-bit),
  * trailing-window masking, island numbering, and both output strings
  * built in StringBuilders — O(tokens), where the equivalent
  * higher-order-function fold paid O(tokens²) array copies AND was
  * re-evaluated once per referencing field (lambda-bearing expressions
  * are skipped by codegen subexpression elimination; a native
  * expression is CSE'd back to one evaluation). */
object SpanCorruptOps {

  /** Called from generated code — must stay public and static-shaped.
    * Returns (input_text, target_text, n_spans, n_masked_tokens). */
  def corrupt(id: Long, toks: ArrayData, startMod: Int, spanLen: Int): InternalRow = {
    val n = toks.numElements()
    val seedId = XXH64.hashLong(id, 42L)
    val inp = new java.lang.StringBuilder
    val tgt = new java.lang.StringBuilder
    var k = -1
    var inSpan = false
    var nMasked = 0
    var lastStart = -spanLen // sentinel: no start seen yet
    var i = 0
    while (i < n) {
      val h = XXH64.hashLong(i.toLong, seedId)
      if (((h % startMod) + startMod) % startMod == 0) lastStart = i
      val masked = i - lastStart < spanLen
      val tok = toks.getUTF8String(i)
      if (!masked) {
        if (inp.length > 0) inp.append(' ')
        inp.append(tok.toString)
        inSpan = false
      } else {
        nMasked += 1
        if (!inSpan) {
          k += 1
          val s = "<extra_id_" + k + ">"
          if (inp.length > 0) inp.append(' ')
          inp.append(s)
          if (tgt.length > 0) tgt.append(' ')
          tgt.append(s)
          inSpan = true
        }
        tgt.append(' ')
        tgt.append(tok.toString)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(inp.toString),
      UTF8String.fromString(tgt.toString),
      k + 1,
      nMasked))
  }

  def spanCorrupt(id: Column, tokens: Column, startMod: Int, spanLen: Int): Column =
    ColumnBridge.column(SpanCorruptExpr(
      ColumnBridge.expression(id), ColumnBridge.expression(tokens),
      startMod, spanLen))
}

/** (doc id, token array) -> the span-corruption record; the
  * referenced-object codegen idiom of [[BpeTokenCount]]. */
case class SpanCorruptExpr(
    left: Expression,
    right: Expression,
    startMod: Int,
    spanLen: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(startMod >= 1 && spanLen >= 1,
    s"need startMod >= 1 and spanLen >= 1, got $startMod, $spanLen")

  override def inputTypes = Seq(LongType, ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("input_text", StringType, nullable = false),
    StructField("target_text", StringType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false),
    StructField("n_masked_tokens", IntegerType, nullable = false)))

  override def nullSafeEval(id: Any, toks: Any): Any =
    SpanCorruptOps.corrupt(
      id.asInstanceOf[Long], toks.asInstanceOf[ArrayData], startMod, spanLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idc, tc) =>
      s"${ev.value} = graft.functions.expressions.SpanCorruptOps.corrupt($idc, $tc, $startMod, $spanLen);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorruptExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_corrupt"
}
