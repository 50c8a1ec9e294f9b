package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-class statistics over a string — the quality-signal
  * kernel (`text_stats(s) -> struct<n_chars,n_alpha,n_digit,n_ws,n_tokens>`).
  *
  * Replaces four separate `regexp_replace` scans per row on the corpus
  * quality path: each ratio (alpha/digit/whitespace/token-length) needs
  * only these counts, and one fused byte loop computes them all. Regex
  * evaluation was the dominant per-row cost of `t02_quality`; at 100 TB
  * the quality pass reads every document, so it must be a straight scan
  * kernel, not five.
  *
  * Semantics match the regex formulations exactly (and hence the DuckDB
  * oracles): alpha = `[A-Za-z]`, digit = `[0-9]`, whitespace = Java
  * `\s` = `[ \t\n\x0B\f\r]` (ASCII), tokens = maximal non-whitespace
  * runs (= `split("\\s+")` with empties removed). Multi-byte UTF-8 chars
  * count toward `n_chars` (code points) and token membership but no
  * ASCII class, exactly like the regexes.
  */
object TextStatsUtil {
  def textStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    var chars = 0L
    var alpha = 0L
    var digit = 0L
    var ws = 0L
    var tokens = 0L
    var inToken = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        chars += 1
        val isWs = b == ' ' || (b >= 0x09 && b <= 0x0d)
        if (isWs) {
          ws += 1
          inToken = false
        } else {
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
          else if (b >= '0' && b <= '9') digit += 1
          if (!inToken) { tokens += 1; inToken = true }
        }
      } else if ((b & 0xc0) != 0x80) { // UTF-8 lead byte: one non-ASCII char
        chars += 1
        if (!inToken) { tokens += 1; inToken = true }
      } // continuation bytes: same char, nothing to count
      i += 1
    }
    new GenericInternalRow(Array[Any](chars, alpha, digit, ws, tokens))
  }
}

case class TextStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = TextStats.schema

  override def nullSafeEval(input: Any): Any =
    TextStatsUtil.textStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextStatsUtil.textStats($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_ws", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  def apply(c: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(c)))
}
