package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase leftmost-longest counting over a phrase TRIE — the
  * documented >10³-phrase upgrade of [[graft.operators.Curation
  * .blocklistFilter]]'s alternation regex (its docstring names this
  * kernel): one automaton walk per word-start position instead of one
  * regex alternation probe, so cost is O(text × longest phrase) with a
  * constant independent of PHRASE COUNT — the regex face degrades with
  * every phrase added, this face doesn't.
  *
  * Semantics are EXACTLY the regex face's (pinned in CurationSpec and
  * by the t42 oracle, which still uses the regex): scan positions left
  * to right; at each word-start take the LONGEST phrase matching the
  * text there whose end also lands on an ASCII word boundary
  * (`[a-zA-Z0-9_]` on either side disqualifies — Java and RE2 agree on
  * `\b` for ASCII, and phrases are lowercase word sequences); count it
  * and resume AT its end (non-overlapping), else advance one position.
  * This is what `regexp_count` does with a longest-first literal
  * alternation in BOTH Java (leftmost-first, so order = priority) and
  * RE2 (leftmost-longest natively).
  *
  * The trie ships to executors once per plan (`addReferenceObj`, the
  * [[WordPieceOps]] pattern) and the walk runs inside whole-stage
  * codegen — scan-local, zero shuffle, streaming-safe. Failure links
  * (full Aho–Corasick) would shave the word-start restart for
  * pathological overlapping dictionaries; with word-bounded phrases
  * the restart-at-next-word-start walk already touches each character
  * O(longest phrase) times worst case.
  */
object PhraseMatchOps {

  /** Phrase trie shipped to executors once per plan. Nodes are dense
    * ints; children are per-node (char → node) maps; `terminal` marks
    * phrase ends. Matching is case-sensitive — callers lowercase the
    * text column, mirroring the regex face's `lower()`. */
  final class PhraseTable private[PhraseMatchOps] (
      private val children: Array[java.util.HashMap[Character, Integer]],
      private val terminal: Array[Boolean]) extends Serializable {

    @inline private def isWord(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'

    /** Leftmost-longest non-overlapping hit count (see object doc). */
    def count(text: String): Long = {
      val n = text.length
      var hits = 0L
      var i = 0
      while (i < n) {
        if (isWord(text.charAt(i)) && (i == 0 || !isWord(text.charAt(i - 1)))) {
          var node = 0
          var j = i
          var best = -1
          while (node >= 0 && j < n) {
            val nx = children(node).get(Character.valueOf(text.charAt(j)))
            if (nx == null) node = -1
            else {
              node = nx.intValue()
              j += 1
              if (terminal(node) && (j == n || !isWord(text.charAt(j)))) best = j
            }
          }
          if (best >= 0) { hits += 1L; i = best } else i += 1
        } else i += 1
      }
      hits
    }
  }

  def table(phrases: Seq[String]): PhraseTable = {
    require(phrases.nonEmpty, "phrase trie needs at least one phrase")
    val ok = "^[a-z0-9 ]+$".r
    phrases.foreach(p => require(ok.matches(p),
      s"phrases must be lowercase word sequences, got '$p'"))
    val children =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    val terminal = scala.collection.mutable.ArrayBuffer(false)
    phrases.foreach { p =>
      var node = 0
      p.foreach { c =>
        val nx = children(node).get(Character.valueOf(c))
        node = if (nx != null) nx.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          terminal += false
          children(node).put(Character.valueOf(c), Integer.valueOf(children.size - 1))
          children.size - 1
        }
      }
      terminal(node) = true
    }
    new PhraseTable(children.toArray, terminal.toArray)
  }

  def countHits(input: UTF8String, t: PhraseTable): Long = t.count(input.toString)

  /** Column face: leftmost-longest non-overlapping phrase hits. The
    * caller lowercases the text to mirror the regex face. */
  def phraseCount(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(PhraseCount(ColumnBridge.expression(text), phrases))
}

/** Trie-walk phrase hit count of one document. */
case class PhraseCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType

  @transient private lazy val tbl: PhraseMatchOps.PhraseTable =
    PhraseMatchOps.table(phrases)

  override def nullSafeEval(input: Any): Any =
    PhraseMatchOps.countHits(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseTable", tbl,
      classOf[PhraseMatchOps.PhraseTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PhraseMatchOps.countHits($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseCount =
    copy(child = newChild)

  override def prettyName: String = "phrase_count"
}
