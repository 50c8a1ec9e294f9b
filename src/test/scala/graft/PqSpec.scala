package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.PqEncode

/** Pins the native [[PqEncode]] codegen kernel to the higher-order
  * `transform`/`aggregate` composition it replaced (kept HERE as the
  * executable reference implementation): same left-fold block
  * distances, same HALF_UP round at 9 dp, same smallest-code
  * tiebreak — including the monotonicity skip-window, which must be
  * selection-invisible. Random vectors AND adversarial exact-tie
  * codebooks (duplicate codewords force the 9 dp tie path). */
class PqSpec extends SparkSpec {

  import spark.implicits._

  /** The pre-round-10 HOF encoder, verbatim (Similarity.pqCodesExpr
    * history): reference semantics for the native kernel. */
  private def hofCodes(
      vec: org.apache.spark.sql.Column,
      codebooks: Array[Array[Seq[Double]]]): org.apache.spark.sql.Column = {
    val numSub = codebooks.length
    val numCodes = codebooks(0).length
    val sub = codebooks(0)(0).length
    val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    def codewordAt(m: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
      element_at(element_at(cbLit, m + 1), k + 1)
    def subDist(m: org.apache.spark.sql.Column, cw: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(1), lit(sub)), lit(0.0), (acc, i) => {
        val x = element_at(vec, m * lit(sub) + i)
        val c = element_at(cw, i)
        acc + (x - c) * (x - c)
      })
    transform(sequence(lit(0), lit(numSub - 1)), m =>
      array_min(transform(sequence(lit(0), lit(numCodes - 1)), k =>
        struct(
          round(subDist(m, codewordAt(m, k)), 9).as("d"),
          k.as("c")))).getField("c"))
  }

  private def compareBoth(
      vecs: Seq[Seq[Double]],
      codebooks: Array[Array[Seq[Double]]]): Unit = {
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val got = df.select(
        col("id"),
        PqEncode.codes(col("v"), codebooks).as("native"),
        hofCodes(col("v"), codebooks).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id=${r.getLong(0)}: native=${r.getSeq[Int](1)} hof=${r.getSeq[Int](2)}")
    }
  }

  test("native kernel == HOF reference on deterministic pseudo-random shapes") {
    // xorshift-ish deterministic doubles; several (numSub, numCodes, sub)
    var s = 0x9e3779b97f4a7c15L
    def nextD(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 1000L).toDouble / 250.0
    }
    for ((numSub, numCodes, sub) <- Seq((2, 4, 3), (4, 16, 4), (8, 32, 8))) {
      val cb = Array.tabulate(numSub, numCodes)((_, _) => Seq.fill(sub)(nextD()))
      val vecs = Seq.fill(40)(Seq.fill(numSub * sub)(nextD()))
      compareBoth(vecs, cb)
    }
  }

  test("exact 9dp ties take the smallest code (skip window is selection-invisible)") {
    // duplicate codewords: codes 1 and 3 are identical -> distance ties
    // EXACTLY, the argmin must report 1; code 0 is far
    val cw = Seq(0.25, -0.5)
    val cb: Array[Array[Seq[Double]]] =
      Array(Array(Seq(100.0, 100.0), cw, Seq(9.0, 9.0), cw))
    val vecs = Seq(Seq(0.25, -0.5), Seq(0.3, -0.4), Seq(8.9, 9.2))
    compareBoth(vecs, cb)
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(PqEncode.codes(col("v").cast("array<double>"), cb).as("c"))
      .collect().map(_.getSeq[Int](0).head).toSeq
    assert(got == Seq(1, 1, 2))
  }

  test("AdcDist native kernel == HOF fold reference (bit-identical left fold)") {
    // the pre-round-11 HOF ADC walk, verbatim (Similarity.pqAdistExpr
    // history): reference semantics for the native kernel
    def hofAdist(lut: org.apache.spark.sql.Column,
        codes: org.apache.spark.sql.Column, numSub: Int, numCodes: Int) =
      aggregate(sequence(lit(0), lit(numSub - 1)), lit(0.0), (acc, m) =>
        acc + element_at(lut, m * lit(numCodes) + lit(1) + element_at(codes, m + 1)))
    var s = 0x243f6a8885a308d3L
    def nextD(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 10000L).toDouble / 100.0
    }
    for ((numSub, numCodes) <- Seq((2, 4), (8, 16), (8, 256))) {
      def nextCode(): Int = {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        math.floorMod(s, numCodes.toLong).toInt
      }
      val rows = (0 until 30).map { i =>
        val lut = Seq.fill(numSub * numCodes)(nextD())
        val codes = Seq.fill(numSub)(nextCode())
        (i.toLong, lut, codes)
      }
      val got = rows.toDF("id", "lut", "codes")
        .select(
          graft.functions.expressions.AdcDist
            .dist(col("lut"), col("codes"), numSub, numCodes).as("native"),
          hofAdist(col("lut"), col("codes"), numSub, numCodes).as("hof"))
        .collect()
      got.foreach { r =>
        // bit-identical, not approximately equal: same fold order
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
      }
      // null inputs propagate like the HOF
      val nulls = Seq((1L, null: Seq[Double], Seq.fill(numSub)(0)))
        .toDF("id", "lut", "codes")
        .select(graft.functions.expressions.AdcDist
          .dist(col("lut"), col("codes"), numSub, numCodes).as("n"))
        .collect()
      assert(nulls.head.isNullAt(0))
    }
    // shape mismatches ERROR instead of reading past UnsafeArrayData's
    // end (silent garbage distances — round-11 advice): short lut,
    // short codes, and long codes all throw with the ADC shape message
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    def assertShapeError(lut: Seq[Double], codes: Seq[Int]): Unit = {
      val e = intercept[Exception](
        Seq((1L, lut, codes)).toDF("id", "lut", "codes")
          .select(graft.functions.expressions.AdcDist
            .dist(col("lut"), col("codes"), 4, 8).as("d"))
          .collect())
      assert(messages(e).exists(m =>
        m.contains("ADC lut has") || m.contains("ADC codes has")),
        s"expected an ADC shape error, got: $e")
    }
    assertShapeError(Seq.fill(31)(0.0), Seq.fill(4)(0))  // lut one short
    assertShapeError(Seq.fill(32)(0.0), Seq.fill(3)(0))  // codes one short
    assertShapeError(Seq.fill(32)(0.0), Seq.fill(5)(0))  // codes one long
  }

  test("near-boundary distances around the 5e-10 rounding edge agree") {
    // engineered so two codewords differ in raw distance by ~1e-10 —
    // inside the skip window, decided by the rounded compare on both paths
    val base = math.sqrt(2.0) / 3.0
    val cb: Array[Array[Seq[Double]]] = Array(Array(
      Seq(base), Seq(base + 1e-5), Seq(base + 1.0000001e-5), Seq(1.0)))
    val vecs = Seq(Seq(base + 5e-6), Seq(base + 1e-5), Seq(base))
    compareBoth(vecs, cb)
  }
}
