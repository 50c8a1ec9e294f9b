package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WORDPIECE greedy longest-match encoding (Wu et al. 2016; the exact
  * per-word algorithm of BERT's reference `WordpieceTokenizer`): scan
  * each pretoken left to right, at every position take the LONGEST
  * vocabulary piece matching the remaining prefix — pieces at interior
  * positions carry the `##` continuation prefix — and if any position
  * matches nothing, the WHOLE pretoken encodes as `[UNK]` (word-level
  * unknown, not character fallback; that is the BERT semantics and what
  * distinguishes WordPiece serving from BPE's merge replay and
  * unigram's Viterbi DP). Words longer than `maxInputChars` code points
  * are `[UNK]` without scanning, mirroring the reference tokenizer's
  * guard.
  *
  * Completes the production tokenizer triad next to [[BpeOps]]
  * (merge-table replay) and [[UnigramOps]] (Viterbi) — the encoder is
  * vocabulary-agnostic: feed a hand vocabulary, a published BERT
  * vocabulary file, or derive pieces from the unigram/BPE learners.
  *
  * Everything is scan-local and greedy-deterministic: one pass per
  * pretoken, longest-match ties impossible (lengths are distinct), so
  * the encoding is a pure function of (pretoken, vocabulary) — exactly
  * replayable by the DuckDB oracle's fold.
  */
object WordPieceOps {

  val Unk = "[UNK]"

  /** Immutable lookup table shipped to executors once per plan
    * (`addReferenceObj`): the piece set plus the max piece length
    * (continuation pieces measured WITHOUT their `##` prefix) so the
    * greedy scan bounds its longest-match probe. */
  final class VocabTable(
      val pieces: java.util.HashSet[String],
      val maxLen: Int,
      val maxInputChars: Int) extends Serializable

  def table(vocab: Seq[String], maxInputChars: Int = 100): VocabTable = {
    require(vocab.nonEmpty, "wordpiece vocabulary must be non-empty")
    require(maxInputChars >= 1, s"maxInputChars must be >= 1, got $maxInputChars")
    val set = new java.util.HashSet[String](vocab.size * 2)
    var ml = 1
    vocab.foreach { p =>
      require(p.nonEmpty && p != "##", s"bad wordpiece piece: '$p'")
      set.add(p)
      val core = if (p.startsWith("##")) p.substring(2) else p
      val cps = core.codePointCount(0, core.length)
      if (cps > ml) ml = cps
    }
    new VocabTable(set, ml, maxInputChars)
  }

  /** Code points of a UTF8String as per-code-point strings — the same
    * slicing basis as [[UnigramOps]], so multi-byte text segments on
    * character boundaries, never mid-surrogate. */
  private def codePoints(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Greedy longest-match piece list for one pretoken; `[UNK]` alone on
    * any failure. Empty input encodes to an empty list. */
  def encode(word: String, t: VocabTable): Seq[String] = {
    val cps = codePoints(word)
    val n = cps.length
    if (n == 0) return Seq.empty
    if (n > t.maxInputChars) return Seq(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      var end = math.min(n, pos + t.maxLen)
      var found: String = null
      while (found == null && end > pos) {
        val core = cps.slice(pos, end).mkString
        val cand = if (pos == 0) core else "##" + core
        if (t.pieces.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Seq(Unk)
      out += found
      pos = end
    }
    out.toSeq
  }

  def piecesArray(input: UTF8String, t: VocabTable): GenericArrayData =
    new GenericArrayData(
      encode(input.toString, t).map(UTF8String.fromString).toArray[Any])

  def pieceCount(input: UTF8String, t: VocabTable): Int =
    encode(input.toString, t).length

  // ---------- column faces ----------

  def wordpiecePieces(pretoken: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      WordPieceEncode(ColumnBridge.expression(pretoken), vocab))

  def wordpieceCount(pretoken: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      WordPieceCount(ColumnBridge.expression(pretoken), vocab))
}

/** Greedy longest-match piece sequence of one pretoken. */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val tbl: WordPieceOps.VocabTable = WordPieceOps.table(vocab)

  override def nullSafeEval(input: Any): Any =
    WordPieceOps.piecesArray(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceTable", tbl,
      classOf[WordPieceOps.VocabTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WordPieceOps.piecesArray($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_encode"
}

/** Greedy longest-match piece COUNT — the budgeting face. */
case class WordPieceCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType

  @transient private lazy val tbl: WordPieceOps.VocabTable = WordPieceOps.table(vocab)

  override def nullSafeEval(input: Any): Any =
    WordPieceOps.pieceCount(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceTable", tbl,
      classOf[WordPieceOps.VocabTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WordPieceOps.pieceCount($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCount =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_count"
}
