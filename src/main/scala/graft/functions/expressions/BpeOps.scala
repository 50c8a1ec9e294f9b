package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary-driven byte-pair-encoding: apply a learned merge table to a
  * pretoken and count (or emit) the resulting subword tokens. This is the
  * missing half of the GPT-2-style tokenizer whose PRETOKENIZATION lives
  * in [[graft.functions.TextFunctions.bpePattern]] — pretokens are the
  * corpus-size proxy, merged-token counts are what a training run
  * actually budgets by.
  *
  * Algorithm: merges are applied strictly in rank order, each rank in one
  * left-to-right pass over the symbol sequence (non-overlapping). For a
  * WELL-FORMED merge table — every merge's two parts are single
  * characters or outputs of earlier merges, and no two merges produce the
  * same output string — this is equivalent to the reference priority-
  * queue formulation ("repeatedly merge the lowest-ranked adjacent
  * pair"): a merge at rank r can only create adjacencies involving its
  * output, and every pair containing that output has rank > r, so no
  * lower-ranked pair ever (re)appears after its pass. Well-formedness is
  * checked eagerly at construction; the same invariant is what lets the
  * DuckDB oracle replay the encoding with a rank-stepping recursive CTE.
  *
  * Scale note: the merge loop is O(|merges| * |pretoken|) per DISTINCT
  * pretoken — callers (see [[graft.operators.Bpe]]) dedupe pretokens
  * first, so the loop cost is vocabulary-sized, never corpus-sized.
  */
object BpeOps {

  /** Validated, serializable merge table (rank = array index). */
  final class MergeTable(val a: Array[String], val b: Array[String])
      extends Serializable {
    def size: Int = a.length
  }

  def table(merges: Seq[(String, String)]): MergeTable = {
    val formed = scala.collection.mutable.HashSet[String]()
    def isAtom(s: String): Boolean =
      s.nonEmpty && s.codePointCount(0, s.length) == 1
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(isAtom(a) || formed(a),
        s"merge $r: left part '$a' is neither a single character nor an earlier merge output")
      require(isAtom(b) || formed(b),
        s"merge $r: right part '$b' is neither a single character nor an earlier merge output")
      val out = a + b
      require(!formed(out), s"merge $r: output '$out' duplicates an earlier merge output")
      formed += out
    }
    new MergeTable(merges.map(_._1).toArray, merges.map(_._2).toArray)
  }

  /** Split into code points (matches DuckDB's per-character substring, so
    * the oracle's initial symbol list is identical beyond ASCII). */
  private def codePoints(s: String): Array[String] = {
    val out = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Apply the full merge table to one pretoken. */
  def encode(s: String, t: MergeTable): Array[String] = {
    var syms = codePoints(s)
    var r = 0
    while (r < t.size && syms.length >= 2) {
      val a = t.a(r)
      val b = t.b(r)
      // one left-to-right non-overlapping pass merging every (a, b)
      var i = 0
      var hit = false
      while (i < syms.length - 1 && !hit) {
        hit = syms(i) == a && syms(i + 1) == b
        i += 1
      }
      if (hit) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += a + b
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
      }
      r += 1
    }
    syms
  }

  /** Called from generated code — must stay public and static-shaped. */
  def tokenCount(s: UTF8String, t: MergeTable): Int =
    encode(s.toString, t).length

  /** Binary string order — CODE POINTS, not Java's UTF-16 code units.
    * Spark's `orderBy` on strings compares UTF8String bytes, and UTF-8
    * byte order equals code-point order; Java's natural String order
    * compares UTF-16 code units, which ranks BMP chars in U+E000–U+FFFF
    * ABOVE supplementary (non-BMP) code points. The twin must sort
    * candidates under the same total order as the distributed learner's
    * `orderBy` or count-tied selections diverge on non-BMP symbols. */
  val codePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      var i = 0
      var j = 0
      while (i < x.length && j < y.length) {
        val cx = x.codePointAt(i)
        val cy = y.codePointAt(j)
        if (cx != cy) return Integer.compare(cx, cy)
        i += Character.charCount(cx)
        j += Character.charCount(cy)
      }
      Integer.compare(x.length - i, y.length - j)
    }
  }

  /** Greedy batch selection over ONE round's sorted candidate pairs
    * (count desc, then (a, b) — already sorted and filtered by the
    * caller): accept up to `want` pairs that are mutually NON-INTERACTING
    * — a candidate is accepted only if its two symbols AND its output
    * string are disjoint from the symbols and outputs of every pair
    * already accepted this round. Disjointness is what makes batch
    * application exact: merging an accepted pair can neither create nor
    * destroy an adjacency of any other accepted pair (its output is not
    * a symbol of theirs; the symbols it consumes are not symbols of
    * theirs), so every accepted pair's count is its exact global count
    * at batch-count time, and applying the whole batch in one pass
    * equals applying its pairs sequentially in order. With `want = 1`
    * this degenerates to the classic Sennrich argmax. Shared by the
    * distributed learner and the driver-side twin so the two can only
    * diverge in what they COUNT — which is exactly what the equivalence
    * spec pins. */
  def selectBatch(
      sortedCandidates: Seq[(String, String)],
      want: Int): Seq[(String, String)] = {
    val used = scala.collection.mutable.HashSet[String]()
    val acc = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val it = sortedCandidates.iterator
    while (acc.size < want && it.hasNext) {
      val (a, b) = it.next()
      val out = a + b
      if (!used(a) && !used(b) && !used(out)) {
        acc += ((a, b))
        used += a
        used += b
        used += out
      }
    }
    acc.toSeq
  }

  /** Sequential reference BPE TRAINER over a pretoken-count dictionary
    * (Sennrich et al. 2016): each round merges the globally most
    * frequent adjacent pair — count desc, then lexicographic (a, b) —
    * skipping pairs whose output string an earlier merge already
    * produced (keeps the table well-formed). This is the driver-side
    * twin of [[graft.operators.Bpe.learnMerges]] (spec-pinned equal),
    * and — being pure Scala — the generator the t18 oracle uses to
    * derive the EXPECTED learned table at oracle-build time.
    *
    * `batchSize` > 1 turns on batch-greedy training (the scale path —
    * see [[graft.operators.Bpe.learnMerges]] for why): per round, up to
    * `batchSize` mutually non-interacting pairs from the top
    * `candidateLimit` sorted candidates are merged together
    * ([[selectBatch]]). `batchSize = 1` is EXACTLY the classic
    * sequential algorithm, whatever `candidateLimit`. */
  def learnMergesLocal(
      pretokenCounts: Map[String, Long],
      numMerges: Int,
      minPairCount: Long = 2L,
      batchSize: Int = 1,
      candidateLimit: Int = 64): Seq[(String, String)] = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(candidateLimit >= batchSize,
      s"candidateLimit ($candidateLimit) must be >= batchSize ($batchSize)")
    // code-point split (NOT UTF-16 chars): keeps this twin equal to the
    // distributed learner and to encode() on non-BMP input.
    var vocab: Map[Vector[String], Long] =
      pretokenCounts.groupMapReduce(kv => codePoints(kv._1).toVector)(_._2)(_ + _)
    val learned = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val outs = scala.collection.mutable.HashSet[String]()
    var continue = true
    while (learned.size < numMerges && continue) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.updateWith((syms(i), syms(i + 1)))(
            p => Some(p.getOrElse(0L) + c))
          i += 1
        }
      }
      val candidates = pairCounts.toSeq
        .filter { case ((a, b), c) => c >= minPairCount && !outs.contains(a + b) }
        .sortBy { case ((x, y), c) => (-c, x, y) }(
          Ordering.Tuple3(Ordering.Long, codePointOrdering, codePointOrdering))
        .take(candidateLimit)
        .map(_._1)
      val accepted = selectBatch(
        candidates, math.min(batchSize, numMerges - learned.size))
      if (accepted.isEmpty) continue = false
      else {
        learned ++= accepted
        accepted.foreach { case (a, b) => outs += (a + b) }
        val fuse = accepted.map { case (a, b) => (a, b) -> (a + b) }.toMap
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            val hit =
              if (j + 1 < syms.length) fuse.get((syms(j), syms(j + 1))) else None
            hit match {
              case Some(o) => out += o; j += 2
              case None => out += syms(j); j += 1
            }
          }
          out.result()
        }(_._2)(_ + _)
      }
    }
    learned.toSeq
  }

  /** Called from generated code — must stay public and static-shaped. */
  def encodeArray(s: UTF8String, t: MergeTable): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encode(s.toString, t).map(UTF8String.fromString): Array[Any])

  /** Column face: merged-token count of one pretoken. */
  def bpeMergedCount(pretoken: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(pretoken), merges))

  /** Column face: the merged SUBWORD TOKEN SEQUENCE of one pretoken —
    * the materialization [[bpeMergedCount]] only counts. */
  def bpeEncode(pretoken: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeTokens(ColumnBridge.expression(pretoken), merges))
}

/** Merged-subword count of a single pretoken under a fixed merge table.
  * Codegen inlines to one static call with the validated table attached
  * as a referenced object (the RegExpExtract pattern-object idiom), so
  * the expression stays inside whole-stage codegen. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType

  @transient private lazy val tbl: BpeOps.MergeTable = BpeOps.table(merges)

  override def nullSafeEval(input: Any): Any =
    BpeOps.tokenCount(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", tbl, classOf[BpeOps.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeOps.tokenCount($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

/** Merged subword TOKEN SEQUENCE of a single pretoken under a fixed
  * merge table — the array face of [[BpeTokenCount]] (same validated
  * table, same one-pass-per-rank loop), for pipelines that materialize
  * the tokens themselves (packing, shard writing) rather than budget by
  * their count. Same codegen idiom: one static call with the table as a
  * referenced object, inside whole-stage codegen. */
case class BpeEncodeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  @transient private lazy val tbl: BpeOps.MergeTable = BpeOps.table(merges)

  override def nullSafeEval(input: Any): Any =
    BpeOps.encodeArray(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", tbl, classOf[BpeOps.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeOps.encodeArray($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}
