package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder (Jégou, Douze & Schmid, TPAMI 2011): for
  * each of `numSub` contiguous blocks of a vector, the index of the
  * nearest codeword under squared L2 — the per-row kernel of the PQ/
  * IVF-PQ similarity cascade ([[graft.operators.Similarity.pqKnn]]).
  *
  * A native Catalyst `Expression` with `doGenCode`, NOT the higher-order
  * `transform`/`aggregate` composition it replaces: encoding is
  * numSub x numCodes x sub FLOPs per corpus row (16 384 at the canonical
  * 8x256x8 shape), and the HOF version paid an interpreted lambda
  * dispatch per FLOP — the s11 corpus pass was ~20 s at sf0.1 against
  * tens of milliseconds of actual arithmetic. This kernel is the same
  * arithmetic as ONE tight codegen loop per row.
  *
  * Exactness contract (the DuckDB oracle replays it bit-for-bit, and the
  * swap from the HOF version must not move a single code):
  *   - block distance is the LEFT fold ((0 + t₁) + t₂) + … in coordinate
  *     order, tᵢ = (xᵢ − cᵢ)²;
  *   - each distance rounds at 9 dp exactly like Spark's `round`
  *     (BigDecimal.valueOf, HALF_UP) before comparison;
  *   - argmin ties take the smallest code (strict `<` over ascending k —
  *     the lexicographic struct-min the HOF version used).
  *
  * The flattened codebook ([m][k][i] → m·numCodes·sub + k·sub + i) rides
  * the plan as a reference object, not a literal expression tree — the
  * unrolled-literal alternative was a ~100k-node tree that blew
  * codegen/broadcast planning (see subDist's history). */
case class PqEncode(
    child: Expression,
    numSub: Int,
    numCodes: Int,
    sub: Int,
    codebook: Array[Double]) extends UnaryExpression with ExpectsInputTypes {

  require(codebook.length == numSub * numCodes * sub,
    s"codebook length ${codebook.length} != $numSub*$numCodes*$sub")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // The decimal rounding itself (BigDecimal.valueOf → Double.toString →
  // setScale) costs ~100× the 8 FLOPs it follows, so the argmin loop
  // exploits monotonicity to skip it: round(d) ≥ d − 5e-10 (HALF_UP moves
  // a value by at most half a 9-dp step), so any d > bestRounded + 2e-9
  // rounds strictly above the incumbent and can neither win nor tie —
  // only near-boundary candidates pay the exact rounding, and the
  // coordinate loop may bail the moment the partial sum crosses the same
  // threshold (the sum of squares only grows). Selection is IDENTICAL to
  // rounding all candidates: ties at 9 dp land inside the window, get
  // rounded, and lose to the incumbent under strict `<` exactly as in
  // the all-rounded loop.
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      var bestD = Double.PositiveInfinity
      var skip = Double.PositiveInfinity
      var bestC = 0
      val base = m * numCodes * sub
      val vo = m * sub
      var k = 0
      while (k < numCodes) {
        var d = 0.0
        val co = base + k * sub
        var i = 0
        while (i < sub && d <= skip) {
          val t = v.getDouble(vo + i) - codebook(co + i)
          d += t * t
          i += 1
        }
        if (d <= skip) {
          // non-finite guard: BigDecimal.valueOf(NaN/Inf) throws, and
          // Spark's `round` (the HOF path this replaced) passes
          // non-finite through unchanged — do the same. NaN compares
          // false against everything and +Inf never beats a finite (or
          // initial-Inf) incumbent under strict `<`, so a non-finite
          // distance is a non-winner, exactly as in the HOF version.
          // (NaN additionally fails `d <= skip` and never reaches here.)
          if (java.lang.Double.isFinite(d)) {
            d = java.math.BigDecimal.valueOf(d)
              .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
          }
          if (d < bestD) { bestD = d; bestC = k; skip = d + 2e-9 }
        }
        k += 1
      }
      codes(m) = bestC
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      val vo = ctx.freshName("vo")
      val co = ctx.freshName("co")
      val skip = ctx.freshName("skip")
      // same skip-window argmin as nullSafeEval (see the comment there)
      s"""
         |int[] $codes = new int[$numSub];
         |for (int $m = 0; $m < $numSub; $m++) {
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  double $skip = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  int $base = $m * $numCodes * $sub;
         |  int $vo = $m * $sub;
         |  for (int $k = 0; $k < $numCodes; $k++) {
         |    double $d = 0.0;
         |    int $co = $base + $k * $sub;
         |    for (int $i = 0; $i < $sub && $d <= $skip; $i++) {
         |      double $t = $c.getDouble($vo + $i) - $cb[$co + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d <= $skip) {
         |      if (java.lang.Double.isFinite($d)) {
         |        $d = java.math.BigDecimal.valueOf($d)
         |          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue();
         |      }
         |      if ($d < $bestD) { $bestD = $d; $bestC = $k; $skip = $d + 2e-9; }
         |    }
         |  }
         |  $codes[$m] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** ADC (asymmetric distance computation) total: the per-candidate-pair
  * kernel of the PQ probe — `Σ_m lut[m·numCodes + codes[m]]`, the
  * query's lookup table indexed by the corpus row's codes, folded in
  * block order (the left fold `((0 + t₀) + t₁) + …`, bit-identical to
  * the `aggregate`/`element_at` HOF composition it replaces — pinned by
  * a native≡HOF property spec in PqSpec).
  *
  * Why native (round-11 stretch — the PqEncode rationale applied to the
  * probe side): the HOF fold paid an interpreted lambda dispatch per
  * block PER CANDIDATE PAIR, and the candidate join emits
  * ~|corpus|·nProbe/nCells pairs per query — at 100 TB the ADC walk is
  * the probe's hot loop exactly as encoding is the build's. Here it is
  * one codegen loop per pair: numSub adds, two array reads per add.
  *
  * Out-of-range codes are impossible by construction (the codes column
  * is [[PqEncode]] output, always in [0, numCodes)); a violation throws
  * rather than silently misindexing. */
case class AdcDist(
    left: Expression,
    right: Expression,
    numSub: Int,
    numCodes: Int) extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    // shape checks mirror the code-range check: on UnsafeArrayData a
    // read past numElements() returns garbage silently, so a mismatched
    // lut/codes column would yield wrong distances instead of an error
    // (the HOF element_at path this replaced was bounds-checked)
    if (lut.numElements() != numSub * numCodes)
      throw new IllegalStateException(
        s"ADC lut has ${lut.numElements()} entries, expected ${numSub * numCodes}")
    if (codes.numElements() != numSub)
      throw new IllegalStateException(
        s"ADC codes has ${codes.numElements()} entries, expected $numSub")
    var s = 0.0
    var m = 0
    while (m < numSub) {
      val c = codes.getInt(m)
      if (c < 0 || c >= numCodes)
        throw new IllegalStateException(s"ADC code $c out of [0, $numCodes)")
      s += lut.getDouble(m * numCodes + c)
      m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val s = ctx.freshName("adc")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      s"""
         |if ($l.numElements() != ${numSub * numCodes})
         |  throw new IllegalStateException("ADC lut has " + $l.numElements()
         |    + " entries, expected " + ${numSub * numCodes});
         |if ($r.numElements() != $numSub)
         |  throw new IllegalStateException("ADC codes has " + $r.numElements()
         |    + " entries, expected " + $numSub);
         |double $s = 0.0;
         |for (int $m = 0; $m < $numSub; $m++) {
         |  int $c = $r.getInt($m);
         |  if ($c < 0 || $c >= $numCodes)
         |    throw new IllegalStateException("ADC code out of range: " + $c);
         |  $s += $l.getDouble($m * $numCodes + $c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_dist"
}

object AdcDist {
  /** Column entry point: `lut` is the query's m-major, code-minor ADC
    * table (numSub·numCodes doubles), `codes` the corpus row's PQ codes. */
  def dist(lut: Column, codes: Column, numSub: Int, numCodes: Int): Column =
    ColumnBridge.column(AdcDist(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes),
      numSub, numCodes))
}

object PqEncode {
  /** Column entry point: codes(m) = nearest codeword of block m.
    * `codebooks(m)(k)` is the sub-length codeword. */
  def codes(vec: Column, codebooks: Array[Array[Seq[Double]]]): Column = {
    val numSub = codebooks.length
    val numCodes = codebooks(0).length
    val sub = codebooks(0)(0).length
    val flat = new Array[Double](numSub * numCodes * sub)
    var m = 0
    while (m < numSub) {
      var k = 0
      while (k < numCodes) {
        val cw = codebooks(m)(k)
        var i = 0
        while (i < sub) {
          flat(m * numCodes * sub + k * sub + i) = cw(i)
          i += 1
        }
        k += 1
      }
      m += 1
    }
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(vec), numSub, numCodes, sub, flat))
  }
}
