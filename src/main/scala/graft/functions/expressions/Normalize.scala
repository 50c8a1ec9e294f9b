package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the CCNet/RefinedWeb-style cleanup pass a
  * web corpus runs BEFORE tokenization, dedup shingling and quality
  * scoring, so that byte-level encoding noise (NBSP vs space, curly vs
  * straight quotes, zero-width joiners, stray control bytes) never
  * splits what is semantically the same text into distinct shingles.
  * One native codegen'd kernel — no UDF, no regex chain (a faithful
  * regexp_replace composition needs 6+ passes over every document; this
  * is one NFC pass plus one code-point sweep):
  *
  *  - Unicode NFC (canonical composition — `e` + U+0301 becomes `é`),
  *    applied AFTER the sweep so marks re-exposed by dropped characters
  *    still compose (idempotence; see the in-body note); pure-ASCII
  *    rows take the `Normalizer.isNormalized` fast path;
  *  - line breaks: `\r\n` and lone `\r` become `\n`; blank-line
  *    structure is preserved (paragraph signals matter downstream);
  *  - zero-width/format characters dropped: U+200B..U+200D ZW space/
  *    non-joiner/joiner, U+2060 word joiner, U+FEFF BOM, U+00AD soft
  *    hyphen;
  *  - every other Unicode space separator (category Zs: NBSP, en/em
  *    spaces, ideographic space, ...) and TAB becomes a plain space;
  *  - horizontal-space runs collapse to ONE space, and spaces at line
  *    starts/ends (hence document starts/ends) are stripped;
  *  - typographic punctuation unified to ASCII: curly/low-9 single
  *    quotes U+2018..U+201B to `'`, double quotes U+201C..U+201F to
  *    `"`, hyphen/dash family U+2010..U+2015 and U+2212 to `-`,
  *    ellipsis U+2026 to `...`;
  *  - remaining C0/C1 control characters (except `\n`; TAB already
  *    handled) dropped.
  *
  * Deterministic, locale-independent (NFC and Zs membership are
  * Unicode-data lookups), null-safe, and a pure per-row projection:
  * fuses into whole-stage codegen at the scan, shuffles nothing, and
  * runs unchanged as a stateless streaming select.
  */
object NormalizeUtil {

  private val ZeroWidth = Set(0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD)

  def normalizeText(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false // deferred: emitted before the next glyph only
    var lineHasContent = false
    def emitGlyph(): Unit = {
      if (pendingSpace && lineHasContent) sb.append(' ')
      pendingSpace = false
      lineHasContent = true
    }
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == '\r') {
        // \r\n collapses into the \n that follows; a lone \r IS a newline
        if (i >= n || str.charAt(i) != '\n') {
          sb.append('\n'); pendingSpace = false; lineHasContent = false
        }
      } else if (cp == '\n') {
        sb.append('\n'); pendingSpace = false; lineHasContent = false
      } else if (ZeroWidth.contains(cp)) {
        () // dropped entirely — never becomes a space
      } else if (cp == ' ' || cp == '\t' ||
        Character.getType(cp) == Character.SPACE_SEPARATOR) {
        pendingSpace = true
      } else if (cp >= 0x2018 && cp <= 0x201B) {
        emitGlyph(); sb.append('\'')
      } else if (cp >= 0x201C && cp <= 0x201F) {
        emitGlyph(); sb.append('"')
      } else if ((cp >= 0x2010 && cp <= 0x2015) || cp == 0x2212) {
        emitGlyph(); sb.append('-')
      } else if (cp == 0x2026) {
        emitGlyph(); sb.append("...")
      } else if (Character.isISOControl(cp)) {
        () // stray control bytes dropped
      } else {
        emitGlyph(); sb.appendCodePoint(cp)
      }
    }
    // NFC AFTER the sweep, not before: dropping a character (a control,
    // a zero-width) can butt a combining mark against a new base — an
    // NFC-first output would be decomposed there, breaking idempotence
    // (caught by NormalizePropSpec). NFC never produces a character the
    // sweep handles (canonical mappings yield letters, not separators/
    // punctuation), so sweep-then-compose is complete; pure-ASCII
    // results take the isNormalized fast path and never reallocate.
    val swept = sb.toString
    UTF8String.fromString(
      if (java.text.Normalizer.isNormalized(swept, java.text.Normalizer.Form.NFC)) swept
      else java.text.Normalizer.normalize(swept, java.text.Normalizer.Form.NFC))
  }
}

/** `normalize_text(str) -> str` ([[NormalizeUtil.normalizeText]]). */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeUtil.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NormalizeUtil.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
  override def prettyName: String = "normalize_text"
}

object Normalize {
  def normalizeText(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}
