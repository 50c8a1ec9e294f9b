package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native cell-parse kernels for the CSV read path — hand-rolled byte
  * validators replacing the `rlike` + `regexp_replace` + `cast`
  * compositions in [[graft.functions.Parsing]]. Reading a W-column file
  * evaluates a parse per cell; with java.util.regex that is ~1µs × W per
  * row and dominated the FL2 benchdemo comparison (the reference's
  * whole 0.37 s budget is the parse loop). These are the same semantics
  * as the regexes, bit-for-bit:
  *
  *  - intish (`ColumnTypeable.hs:61-74`): optional sign, >= 1 digit,
  *    optional LITERAL ".0" suffix -> long; null on anything else
  *    (including 19+-digit overflow, where the regex+ANSI-cast pipeline
  *    would error — null is the strict-read-friendly behavior);
  *  - lenient double (`ColumnTypeable.hs:77-80`): commas stripped
  *    anywhere, then `[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?`; value via
  *    `Double.parseDouble`, exactly what Spark's string->double cast
  *    uses;
  *  - bool: `true`/`false`, case-insensitive.
  *
  * All trim ASCII spaces first, matching `functions.trim`.
  */
object ParseUtil {

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Trimmed [from, until) span of ASCII spaces, like functions.trim. */
  private def span(bytes: Array[Byte]): (Int, Int) = {
    var from = 0
    var until = bytes.length
    while (from < until && bytes(from) == ' ') from += 1
    while (until > from && bytes(until - 1) == ' ') until -= 1
    (from, until)
  }

  def parseIntish(s: UTF8String): java.lang.Long = {
    val bytes = s.getBytes
    var (i, until) = span(bytes)
    if (i >= until) return null
    var neg = false
    val b0 = bytes(i)
    if (b0 == '+' || b0 == '-') { neg = b0 == '-'; i += 1 }
    if (i >= until || !isDigit(bytes(i))) return null
    var v = 0L
    while (i < until && isDigit(bytes(i))) {
      val d = bytes(i) - '0'
      if (v > (Long.MaxValue - d) / 10) return null // overflow -> null
      v = v * 10 + d
      i += 1
    }
    if (i < until) {
      // only a literal ".0" suffix is allowed ("5.0" -> 5; "5.00" is not intish)
      if (until - i != 2 || bytes(i) != '.' || bytes(i + 1) != '0') return null
    }
    java.lang.Long.valueOf(if (neg) -v else v)
  }

  def parseDouble(s: UTF8String): java.lang.Double = {
    val bytes = s.getBytes
    val (from, until) = span(bytes)
    if (from >= until) return null
    // strip grouping commas anywhere, as regexp_replace(c, ",", "") does
    val clean = new Array[Byte](until - from)
    var n = 0
    var i = from
    while (i < until) {
      val b = bytes(i)
      if (b != ',') { clean(n) = b; n += 1 }
      i += 1
    }
    // validate: [+-]? ( \d+ (\.\d*)? | \.\d+ ) ( [eE][+-]?\d+ )?
    var p = 0
    if (p < n && (clean(p) == '+' || clean(p) == '-')) p += 1
    var intDigits = 0
    while (p < n && isDigit(clean(p))) { intDigits += 1; p += 1 }
    var fracDigits = 0
    if (p < n && clean(p) == '.') {
      p += 1
      if (intDigits == 0) {
        // ".5" form requires >= 1 fractional digit
        while (p < n && isDigit(clean(p))) { fracDigits += 1; p += 1 }
        if (fracDigits == 0) return null
      } else {
        while (p < n && isDigit(clean(p))) { fracDigits += 1; p += 1 }
      }
    } else if (intDigits == 0) return null
    if (p < n && (clean(p) == 'e' || clean(p) == 'E')) {
      p += 1
      if (p < n && (clean(p) == '+' || clean(p) == '-')) p += 1
      var expDigits = 0
      while (p < n && isDigit(clean(p))) { expDigits += 1; p += 1 }
      if (expDigits == 0) return null
    }
    if (p != n) return null
    java.lang.Double.valueOf(
      java.lang.Double.parseDouble(new String(clean, 0, n, "US-ASCII")))
  }

  def parseBool(s: UTF8String): java.lang.Boolean = {
    val bytes = s.getBytes
    val (from, until) = span(bytes)
    val len = until - from
    @inline def lc(i: Int): Int = bytes(from + i) | 0x20
    if (len == 4 && lc(0) == 't' && lc(1) == 'r' && lc(2) == 'u' && lc(3) == 'e')
      java.lang.Boolean.TRUE
    else if (len == 5 && lc(0) == 'f' && lc(1) == 'a' && lc(2) == 'l' &&
      lc(3) == 's' && lc(4) == 'e')
      java.lang.Boolean.FALSE
    else null
  }
}

private[expressions] abstract class NullableParse
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = true

  protected def helper: String
  protected def boxedType: String
  protected def primName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("parsed")
      s"""
         |$boxedType $r = graft.functions.expressions.ParseUtil.$helper($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.${primName}Value(); }
       """.stripMargin
    })
}

/** `parse_intish(str) -> long` (null on failure). */
case class ParseIntish(child: Expression) extends NullableParse {
  override def dataType: DataType = LongType
  override protected def helper: String = "parseIntish"
  override protected def boxedType: String = "java.lang.Long"
  override protected def primName: String = "long"
  override def nullSafeEval(input: Any): Any =
    ParseUtil.parseIntish(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ParseIntish =
    copy(child = newChild)
  override def prettyName: String = "parse_intish"
}

/** `parse_lenient_double(str) -> double` (null on failure). */
case class ParseLenientDouble(child: Expression) extends NullableParse {
  override def dataType: DataType = DoubleType
  override protected def helper: String = "parseDouble"
  override protected def boxedType: String = "java.lang.Double"
  override protected def primName: String = "double"
  override def nullSafeEval(input: Any): Any =
    ParseUtil.parseDouble(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ParseLenientDouble =
    copy(child = newChild)
  override def prettyName: String = "parse_lenient_double"
}

/** `parse_bool(str) -> boolean` (null on failure). */
case class ParseBool(child: Expression) extends NullableParse {
  override def dataType: DataType = BooleanType
  override protected def helper: String = "parseBool"
  override protected def boxedType: String = "java.lang.Boolean"
  override protected def primName: String = "boolean"
  override def nullSafeEval(input: Any): Any =
    ParseUtil.parseBool(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ParseBool =
    copy(child = newChild)
  override def prettyName: String = "parse_bool"
}

object ParseOps {
  def parseIntish(c: Column): Column =
    ColumnBridge.column(ParseIntish(ColumnBridge.expression(c)))
  def parseLenientDouble(c: Column): Column =
    ColumnBridge.column(ParseLenientDouble(ColumnBridge.expression(c)))
  def parseBool(c: Column): Column =
    ColumnBridge.column(ParseBool(ColumnBridge.expression(c)))
}
