package graft

import scala.util.Random

import graft.functions.expressions.NormalizeUtil
import org.apache.spark.unsafe.types.UTF8String

/** Randomized invariants for [[NormalizeUtil.normalizeText]] over a
  * code-point pool biased toward the characters the kernel treats
  * specially (separators, zero-width, typographic punctuation,
  * controls, combining marks, supplementary plane). The fixture suite
  * (NormalizeSpec) pins exact expected strings; this checks the
  * CONTRACT holds on inputs nobody hand-wrote: idempotence, a clean
  * output alphabet, and NFC-ness. Seeded, deterministic. */
class NormalizePropSpec extends SparkSpec {

  private val rnd = new Random(42)

  // the kernel's interesting inputs, heavily overweighted
  private val pool: Array[Int] = Array(
    'a', 'b', 'Z', '0', '.', ' ', ' ', ' ', '\t', '\n', '\r',
    0x0301, 0x00E9, 0x0065, // combining acute, precomposed/plain e
    0x00A0, 0x2003, 0x3000, // NBSP, em space, ideographic space
    0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD, // zero-width family
    0x2018, 0x2019, 0x201C, 0x201D, // curly quotes
    0x2010, 0x2013, 0x2014, 0x2212, 0x2026, // dashes, ellipsis
    0x0007, 0x001B, 0x007F, 0x0085, // controls (BEL, ESC, DEL, NEL)
    0x4E2D, 0x1F600) // CJK, supplementary-plane emoji

  private def randomString(): String = {
    val n = rnd.nextInt(40)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach(_ => sb.appendCodePoint(pool(rnd.nextInt(pool.length))))
    sb.toString
  }

  private def norm(s: String): String =
    NormalizeUtil.normalizeText(UTF8String.fromString(s)).toString

  test("idempotent on 2000 random messy strings") {
    (1 to 2000).foreach { _ =>
      val s = randomString()
      val once = norm(s)
      assert(norm(once) == once, s"not idempotent on ${s.codePoints().toArray.toSeq}")
    }
  }

  test("output alphabet is clean: no CR, controls, zero-width, odd spaces, runs") {
    val zw = Set(0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD)
    (1 to 2000).foreach { _ =>
      val out = norm(randomString())
      val cps = out.codePoints().toArray.toSeq
      cps.foreach { cp =>
        assert(cp != '\r', "CR survived")
        assert(!(Character.isISOControl(cp) && cp != '\n'), s"control $cp survived")
        assert(!zw.contains(cp), s"zero-width $cp survived")
        assert(
          !(Character.getType(cp) == Character.SPACE_SEPARATOR && cp != ' '),
          s"space separator $cp survived un-mapped")
      }
      assert(!out.contains("  "), s"space run survived in ${cps}")
      out.split("\n", -1).foreach { line =>
        assert(!line.startsWith(" ") && !line.endsWith(" "),
          s"line-bound space survived: '$line'")
      }
    }
  }

  test("output is NFC-normalized") {
    (1 to 2000).foreach { _ =>
      val out = norm(randomString())
      assert(
        java.text.Normalizer.isNormalized(out, java.text.Normalizer.Form.NFC),
        s"not NFC: ${out.codePoints().toArray.toSeq}")
    }
  }

  test("content is preserved: non-special code points survive in order") {
    // reference replays the kernel's drop-then-compose contract: DELETE
    // exactly what the kernel deletes (zero-width family + controls
    // other than \n\t\r — those are replaced, not dropped, so marks
    // attach to the replacement), THEN NFC; the surviving
    // letters/digits/CJK/emoji must match the kernel's in order
    val zw = Set(0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD)
    val dropped: Int => Boolean = cp =>
      zw.contains(cp) ||
        (Character.isISOControl(cp) && cp != '\n' && cp != '\t' && cp != '\r')
    val keep: Int => Boolean = cp =>
      Character.isLetterOrDigit(cp) || cp == 0x4E2D || cp == 0x1F600
    (1 to 2000).foreach { _ =>
      val s = randomString()
      val sbRef = new java.lang.StringBuilder
      s.codePoints().forEach(cp => if (!dropped(cp)) sbRef.appendCodePoint(cp))
      val ref = java.text.Normalizer
        .normalize(sbRef.toString, java.text.Normalizer.Form.NFC)
      def kept(x: String): Seq[Int] = x.codePoints().toArray.toSeq.filter(keep)
      assert(kept(norm(s)) == kept(ref),
        s"content changed on ${s.codePoints().toArray.toSeq}")
    }
  }
}
