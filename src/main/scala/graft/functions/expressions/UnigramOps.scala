package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UNIGRAM language-model tokenizer (Kudo 2018, the SentencePiece
  * algorithm) in a deterministic Viterbi-EM variant — the second learned
  * subword family next to BPE ([[BpeOps]]): pieces carry probabilities
  * and a pretoken's tokenization is its maximum-likelihood segmentation,
  * where BPE replays a merge history.
  *
  * Determinism is the contract (the [[BpeOps]] discipline):
  *   - piece scores are QUANTIZED log-probabilities —
  *     `round(ln(count/total) * 1e9)` as a long ([[quantLog]]; both the
  *     driver twin and the distributed learner run `Math.log` on the
  *     same JVM, and everything downstream of the rounding is exact
  *     integer arithmetic);
  *   - Viterbi maximizes the exact LONG score sum; at each end position
  *     a tie keeps the segmentation whose final piece is LONGEST
  *     (earliest start index wins), applied left to right — a total
  *     order on segmentations, so twin and distributed encode agree
  *     bit-for-bit;
  *   - every ranking (seed candidates, usage pruning) orders by count
  *     descending then piece in CODE-POINT order
  *     ([[BpeOps.codePointOrdering]] — the same total order as Spark's
  *     binary UTF8 `orderBy`).
  *
  * Training spec (shared EXACTLY by [[graft.operators.Unigram
  * .learnVocab]] and the sequential twin [[trainLocal]]):
  *   1. SEED — all code-point slices of length 1..`maxPieceLen` of the
  *      pretoken vocabulary, weighted by pretoken count (overlapping
  *      occurrences all count). Every SINGLE code point is retained
  *      unconditionally (coverage); multi-cp slices need weighted count
  *      >= `minCount` and only the top `seedSize` by
  *      (count x cpLength desc, piece asc) survive. Initial score =
  *      quantLog over the retained total.
  *   2. EM x `emIters` — E: usage(p) = Σ_w n(w) x multiplicity of p in
  *      the Viterbi segmentation of w under the current vocab. M: keep
  *      all singles at usage floor 1 and every multi piece with
  *      usage >= 1; rescore by quantLog over the kept total.
  *   3. PRUNE — keep all singles plus the top multi pieces by (final
  *      usage desc, piece asc) until `vocabSize`; rescore over the kept
  *      total. Output sorted by piece (code-point order).
  *
  * Unknown single code points at ENCODE time become UNK pieces at the
  * constant [[UnkScore]] — encoding is total on any input; training
  * never produces UNK because the seed's singles cover the corpus.
  *
  * Scale note: like BPE, segmentation is O(maxPieceLen x |pretoken|)
  * per DISTINCT pretoken — callers dedupe pretokens first, so the DP
  * cost is vocabulary-sized, never corpus-sized.
  */
object UnigramOps {

  /** Training hyper-parameters; identical twin/distributed semantics. */
  final case class Params(
      maxPieceLen: Int = 6,
      minCount: Long = 5L,
      seedSize: Int = 200,
      emIters: Int = 2,
      vocabSize: Int = 160) {
    require(maxPieceLen >= 1 && minCount >= 1 && seedSize >= 0 &&
      emIters >= 0 && vocabSize >= 1, s"bad unigram params: $this")
  }

  /** Score of an unknown single-code-point piece — colder than any real
    * piece can score (quantLog >= ln(1/total)*1e9 and corpus totals stay
    * far under e^50), so UNK never outbids a real segmentation. */
  val UnkScore: Long = -50000000000L

  /** The shared score quantizer: ln(count/total) in 1e-9 units. */
  def quantLog(count: Long, total: Long): Long = {
    require(count > 0 && total >= count, s"bad quantLog($count, $total)")
    math.round(math.log(count.toDouble / total.toDouble) * 1e9)
  }

  private[expressions] def codePoints(s: String): Array[String] = {
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

  def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Validated, serializable piece table (the learned artifact). */
  final class PieceTable(val pieces: Array[String], val scores: Array[Long])
      extends Serializable {
    require(pieces.length == scores.length && pieces.nonEmpty,
      "piece table must be non-empty with one score per piece")
    require(pieces.forall(_.nonEmpty), "empty piece in vocabulary")
    require(pieces.distinct.length == pieces.length, "duplicate piece")
    @transient lazy val index: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
      m
    }
    @transient lazy val maxLen: Int = pieces.map(cpLen).max
    def size: Int = pieces.length
  }

  def table(vocab: Seq[(String, Long)]): PieceTable =
    new PieceTable(vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  /** Viterbi maximum-likelihood segmentation (forward DP over code
    * points; exact long sums; per-position ties keep the longest final
    * piece). An unknown SINGLE code point is always a candidate at
    * [[UnkScore]] — a normal competitor in the DP, not a fallback — so
    * encoding is total and the rule is trivially order-independent. */
  def segment(s: String, t: PieceTable): Array[String] = {
    val cps = codePoints(s)
    val n = cps.length
    if (n == 0) return Array.empty
    val NEG = Long.MinValue / 4
    val best = Array.fill(n + 1)(NEG)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      // j ascending = longest candidate piece first; strict improvement
      // keeps the first (longest) piece on score ties
      var j = math.max(0, i - math.max(t.maxLen, 1))
      while (j < i) {
        if (best(j) > NEG) {
          val sb = new java.lang.StringBuilder()
          var q = j
          while (q < i) { sb.append(cps(q)); q += 1 }
          val known = t.index.get(sb.toString)
          val sc: java.lang.Long =
            if (known != null) known
            else if (i - j == 1) java.lang.Long.valueOf(UnkScore)
            else null
          if (sc != null) {
            val cand = best(j) + sc.longValue()
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = n
    while (p > 0) {
      val j = back(p)
      out += cps.slice(j, p).mkString
      p = j
    }
    out.reverseIterator.toArray
  }

  /** Called from generated code — must stay public and static-shaped. */
  def pieceCount(s: UTF8String, t: PieceTable): Int =
    segment(s.toString, t).length

  def piecesArray(s: UTF8String, t: PieceTable): GenericArrayData =
    new GenericArrayData(
      segment(s.toString, t).map(UTF8String.fromString): Array[Any])

  /** All code-point slices of length 1..maxLen (overlapping) — the seed
    * candidate generator. */
  def slices(s: String, maxLen: Int): Array[String] = {
    val cps = codePoints(s)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < cps.length) {
      val lim = math.min(maxLen, cps.length - i)
      var l = 1
      while (l <= lim) {
        out += cps.slice(i, i + l).mkString
        l += 1
      }
      i += 1
    }
    out.toArray
  }

  def slicesArray(s: UTF8String, maxLen: Int): GenericArrayData =
    new GenericArrayData(
      slices(s.toString, maxLen).map(UTF8String.fromString): Array[Any])

  // ---------- driver-side sequential twin (oracle-build machinery) ----------

  /** Sequential seed over a collected pretoken-count map — an
    * INDEPENDENT implementation of training step 1 (plain loops; the
    * distributed learner seeds via explode + keyed aggregation +
    * TakeOrderedAndProject). Returns (piece -> weighted count) for the
    * retained seed and the singles set. */
  private def seedLocal(
      pretokenCounts: Map[String, Long],
      p: Params): (Map[String, Long], Set[String]) = {
    val sub = scala.collection.mutable.HashMap[String, Long]()
    pretokenCounts.foreach { case (w, n) =>
      slices(w, p.maxPieceLen).foreach(pc =>
        sub.update(pc, sub.getOrElse(pc, 0L) + n))
    }
    val singles = sub.keysIterator.filter(cpLen(_) == 1).toSet
    val multi = sub.iterator
      .filter { case (pc, c) => cpLen(pc) > 1 && c >= p.minCount }
      .toSeq
      .sortBy { case (pc, c) => (-(c * cpLen(pc)), pc) }(
        Ordering.Tuple2(Ordering.Long, BpeOps.codePointOrdering))
      .take(p.seedSize)
    (multi.toMap ++ singles.map(c => c -> sub(c)).toMap, singles)
  }

  /** INDEPENDENT sequential Viterbi (the twin's own DP, separate from
    * [[segment]]): scores first, then back-pointer RECONSTRUCTION by
    * re-scanning start positions ascending and taking the first argmax
    * — the same "longest final piece wins ties" total order [[segment]]
    * implements with inline back-pointers, arrived at differently. */
  private[graft] def segmentLocal(
      s: String,
      vocab: Map[String, Long]): List[String] = {
    val cps = codePoints(s).toIndexedSeq
    val n = cps.length
    if (n == 0) return Nil
    val maxLen = if (vocab.isEmpty) 1 else vocab.keysIterator.map(cpLen).max
    val NONE = Long.MinValue / 4
    val best = new Array[Long](n + 1)
    java.util.Arrays.fill(best, NONE)
    best(0) = 0L
    def pieceScore(j: Int, i: Int): Option[Long] = {
      val pc = cps.slice(j, i).mkString
      vocab.get(pc).orElse(if (i - j == 1) Some(UnkScore) else None)
    }
    for (i <- 1 to n; j <- math.max(0, i - math.max(maxLen, 1)) until i)
      pieceScore(j, i).foreach { sc =>
        if (best(j) > NONE && best(j) + sc > best(i)) best(i) = best(j) + sc
      }
    // reconstruct: first (smallest) start achieving the optimum at each
    // end — identical to the forward DP's strict-improvement choice
    var out = List.empty[String]
    var i = n
    while (i > 0) {
      val j = (math.max(0, i - math.max(maxLen, 1)) until i).find(j =>
        best(j) > NONE &&
          pieceScore(j, i).exists(best(j) + _ == best(i))).get
      out = cps.slice(j, i).mkString :: out
      i = j
    }
    out
  }

  /** Sequential Viterbi-EM twin of [[graft.operators.Unigram
    * .learnVocab]] — identical spec, independent implementation: the
    * seed is a driver substring loop ([[seedLocal]]), usage counting is
    * a driver loop with the twin's OWN DP ([[segmentLocal]]), where the
    * distributed learner explodes [[UnigramCandidateSlices]] /
    * [[UnigramEncodePieces]] into keyed aggregations over [[segment]].
    * Any divergence in candidate generation, Viterbi tie-breaking,
    * usage counts, or prune order changes the returned vocabulary and
    * breaks the oracle hash. */
  def trainLocal(
      pretokenCounts: Map[String, Long],
      p: Params): Seq[(String, Long)] = {
    val (seed, singles) = seedLocal(pretokenCounts, p)
    if (seed.isEmpty) return Seq.empty
    var state: Map[String, Long] = seed // piece -> weight (count, then usage)
    for (_ <- 0 until p.emIters) {
      val vocab = scoredVocab(state).toMap
      val usage = scala.collection.mutable.HashMap[String, Long]()
      pretokenCounts.foreach { case (w, n) =>
        segmentLocal(w, vocab).foreach(pc =>
          usage.update(pc, usage.getOrElse(pc, 0L) + n))
      }
      state = mStep(state.keySet, singles, usage.toMap)
    }
    scoredVocab(prune(state, singles, p.vocabSize))
  }

  /** The shared M-step: singles persist at usage floor 1, multi pieces
    * need usage >= 1; `prev` bounds membership (an UNK emitted at
    * encode time can never enter the vocabulary). */
  def mStep(
      prev: Set[String],
      singles: Set[String],
      usage: Map[String, Long]): Map[String, Long] =
    prev.iterator.flatMap { pc =>
      val u = usage.getOrElse(pc, 0L)
      if (singles(pc)) Some(pc -> math.max(u, 1L))
      else if (u >= 1L) Some(pc -> u)
      else None
    }.toMap

  /** The shared final prune: all singles plus top multi by
    * (weight desc, piece asc) until `vocabSize`. */
  def prune(
      state: Map[String, Long],
      singles: Set[String],
      vocabSize: Int): Map[String, Long] = {
    val multiBudget = math.max(0, vocabSize - singles.size)
    val multiKept = state.iterator
      .filter { case (pc, _) => !singles(pc) }
      .toSeq
      .sortBy { case (pc, u) => (-u, pc) }(
        Ordering.Tuple2(Ordering.Long, BpeOps.codePointOrdering))
      .take(multiBudget)
    state.view.filterKeys(singles).toMap ++ multiKept
  }

  /** Weights -> quantized log-prob scores, sorted by piece (code-point
    * order) — the canonical vocabulary rendering. */
  def scoredVocab(state: Map[String, Long]): Seq[(String, Long)] = {
    val total = state.valuesIterator.sum
    state.toSeq
      .sortBy(_._1)(BpeOps.codePointOrdering)
      .map { case (pc, u) => pc -> quantLog(u, total) }
  }

  // ---------- column faces ----------

  def unigramCandidates(pretoken: Column, maxLen: Int): Column =
    ColumnBridge.column(
      UnigramCandidateSlices(ColumnBridge.expression(pretoken), maxLen))

  def unigramPieces(pretoken: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(
      UnigramEncodePieces(ColumnBridge.expression(pretoken), vocab))

  def unigramTokenCount(pretoken: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(
      UnigramPieceCount(ColumnBridge.expression(pretoken), vocab))
}

/** All code-point slices (length 1..maxLen) of one pretoken — the seed
  * candidate generator, inside whole-stage codegen (the [[BpeTokenCount]]
  * referenced-object idiom). */
case class UnigramCandidateSlices(child: Expression, maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    UnigramOps.slicesArray(input.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.UnigramOps.slicesArray($c, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): UnigramCandidateSlices =
    copy(child = newChild)

  override def prettyName: String = "unigram_candidates"
}

/** Viterbi piece sequence of one pretoken under a fixed vocabulary. */
case class UnigramEncodePieces(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val tbl: UnigramOps.PieceTable = UnigramOps.table(vocab)

  override def nullSafeEval(input: Any): Any =
    UnigramOps.piecesArray(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", tbl,
      classOf[UnigramOps.PieceTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.UnigramOps.piecesArray($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodePieces =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}

/** Viterbi piece COUNT of one pretoken — the budgeting face. */
case class UnigramPieceCount(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType

  @transient private lazy val tbl: UnigramOps.PieceTable = UnigramOps.table(vocab)

  override def nullSafeEval(input: Any): Any =
    UnigramOps.pieceCount(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", tbl,
      classOf[UnigramOps.PieceTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.UnigramOps.pieceCount($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPieceCount =
    copy(child = newChild)

  override def prettyName: String = "unigram_token_count"
}
