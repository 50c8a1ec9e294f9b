package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.Normalize.normalizeText

/** [[graft.functions.expressions.NormalizeUtil]] -- the Unicode cleanup
  * pass that canonicalizes encoding noise before shingling/tokenizing.
  * Inputs are built from explicit uXXXX code-point escapes (this source
  * file is pure ASCII); each dimension is pinned against hand-computed
  * expected strings, plus idempotence, identity on clean ASCII, and
  * null safety. */
class NormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(normalizeText(col("t")).as("n"))
      .collect().head.getString(0)

  test("NFC composition: combining acute composes into precomposed form") {
    // input DECOMPOSED (o/e + combining U+0301), expected U+00F3/U+00E9
    assert(norm("Jo\u0301se cafe\u0301") == "J\u00F3se caf\u00E9")
  }

  test("line breaks: CRLF and lone CR both become LF, blank lines survive") {
    assert(norm("a\r\nb\rc") == "a\nb\nc")
    assert(norm("p1\n\np2") == "p1\n\np2")
  }

  test("zero-width characters vanish without leaving a space") {
    assert(norm("zero\u200Bwidth \u200Cnj\u200Dzwj \u2060wj \uFEFFbom \u00ADshy")
      == "zerowidth njzwj wj bom shy")
  }

  test("unicode space separators collapse with plain spaces into one") {
    assert(norm("a\u00A0b") == "a b") // NBSP
    assert(norm("a \u2003 \tb") == "a b") // em-space + tab run
    assert(norm("a\u3000b") == "a b") // ideographic space
  }

  test("spaces strip at line starts and ends, whole string trims") {
    assert(norm("  a b  \n  c  ") == "a b\nc")
    assert(norm(" \t ") == "")
  }

  test("typographic punctuation unifies to ASCII") {
    assert(norm("\u2018q\u2019 \u201Cq\u201D") == "\'q\' \"q\"")
    assert(norm("a\u2013b\u2014c\u2212d") == "a-b-c-d")
    assert(norm("wait\u2026 done") == "wait... done")
  }

  test("stray control bytes drop; clean ASCII is identity") {
    assert(norm("ab\u0007cd\u007F") == "abcd")
    val clean = "key agg row scan slow fast table value"
    assert(norm(clean) == clean)
  }

  test("idempotent: normalizing twice equals once") {
    val messy = "  Jo\u0301se\u200B said \u201Chi\u201D\r\n\tto me\u2026  "
    assert(norm(norm(messy)) == norm(messy))
  }

  test("null-safe and supplementary-plane-safe") {
    val out = Seq[String](null).toDF("t")
      .select(normalizeText(col("t"))).collect().head
    assert(out.isNullAt(0))
    val emoji = new String(Character.toChars(0x1F600))
    assert(norm(s"a $emoji b") == s"a $emoji b") // emoji intact
  }

  test("SQL face: normalize_text registered and equal to the Column API") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(("a  b\u2019s", 1)).toDF("t", "i").createOrReplaceTempView("nrm_in")
    val viaSql = spark.sql("SELECT normalize_text(t) AS n FROM nrm_in")
      .collect().head.getString(0)
    assert(viaSql == "a b\'s")
  }

  test("interpreted eval equals codegen (eval path parity)") {
    // norm() above exercises codegen; force the interpreted path too
    val e = graft.functions.expressions.NormalizeText(
      org.apache.spark.sql.catalyst.expressions.Literal("x \u2003 y\u2014z"))
    assert(e.eval(null).toString == "x y-z")
  }
}
