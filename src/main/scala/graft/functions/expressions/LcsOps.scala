package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over whitespace tokens — the DP
  * kernel behind ROUGE-L (Lin 2004): unlike the contiguous n-gram
  * overlaps of ROUGE-N/BLEU (t31), LCS credits in-order matches across
  * gaps, which is what makes ROUGE-L the standard summarization recall
  * metric.
  *
  * The classic two-row DP — O(|a|·|b|) time, O(min) space — runs as a
  * native expression inside whole-stage codegen (`doGenCode` emits one
  * static call, the [[WordPieceOps]] pattern): scan-local, zero
  * shuffle, streams stateless. Tokenization is the engine-wide
  * whitespace basis ([[graft.functions.TextFunctions.tokens]]), so
  * counts line up with every other text kernel.
  *
  * Scale note: cost is quadratic PER PAIR — the operator-level
  * contract (as with d20's edit-distance verify) is that pair
  * construction is bounded upstream (candidate sets, capped
  * truncation), never all-pairs.
  */
object LcsOps {

  private def tokens(s: String): Array[String] =
    s.split(" ").filter(_.nonEmpty)

  /** Iterative two-row DP; empty sides give 0. */
  def lcsTokenCount(a: UTF8String, b: UTF8String): Int = {
    val x = tokens(a.toString)
    val y = tokens(b.toString)
    val (s, l) = if (x.length <= y.length) (x, y) else (y, x)
    if (s.isEmpty) return 0
    var prev = new Array[Int](s.length + 1)
    var cur = new Array[Int](s.length + 1)
    var i = 0
    while (i < l.length) {
      var j = 0
      while (j < s.length) {
        cur(j + 1) =
          if (l(i) == s(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(s.length)
  }

  def lcsTokens(a: Column, b: Column): Column =
    ColumnBridge.column(
      LcsTokenLen(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Whitespace-token LCS length of two strings. */
case class LcsTokenLen(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsOps.lcsTokenCount(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.LcsOps.lcsTokenCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsTokenLen =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "lcs_tokens"
}
