package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expressions.UnigramOps

/** Randomized properties for the unigram tokenizer's Viterbi core,
  * checked against BRUTE-FORCE enumeration of every segmentation —
  * strings stay short enough (<= 9 code points over a 3-symbol
  * alphabet) that the full 2^(n-1) segmentation space is enumerable,
  * while random vocabularies make score ties, UNK fallbacks, and
  * maximal-piece choices occur constantly. Seeded, deterministic; no
  * Spark session needed (the DP is driver-pure). */
class UnigramPropSpec extends AnyFunSuite {

  private def codePoints(s: String): Vector[String] =
    s.map(_.toString).toVector // test alphabet is BMP-only

  /** Every segmentation of s into non-empty contiguous pieces. */
  private def allSegmentations(s: Vector[String]): Seq[List[String]] =
    if (s.isEmpty) Seq(Nil)
    else (1 to s.length).flatMap { l =>
      allSegmentations(s.drop(l)).map(rest => s.take(l).mkString :: rest)
    }

  /** Score under the spec: known pieces score their table value,
    * unknown SINGLE code points score UnkScore, anything else is
    * inadmissible. */
  private def score(seg: List[String], vocab: Map[String, Long]): Option[Long] =
    seg.foldLeft(Option(0L)) { (acc, p) =>
      acc.flatMap { a =>
        vocab.get(p).map(a + _)
          .orElse(if (p.length == 1) Some(a + UnigramOps.UnkScore) else None)
      }
    }

  test("segment attains the brute-force optimum and the spec'd tie-break, on 400 random cases") {
    val rnd = new Random(1234)
    val alphabet = "abc"
    for (trial <- 1 to 400) {
      val w = Seq.fill(1 + rnd.nextInt(9))(alphabet(rnd.nextInt(3))).mkString
      val cps = codePoints(w)
      // random vocab: random slices at coarse random scores (coarse so
      // ties actually happen), singles included only sometimes (so UNK
      // paths trigger)
      val cand = (for {
        i <- cps.indices; l <- 1 to math.min(3, cps.length - i)
      } yield cps.slice(i, i + l).mkString).distinct
      val vocab = cand.filter(_ => rnd.nextInt(3) > 0)
        .map(p => p -> (-1000000000L * (1 + rnd.nextInt(4)).toLong)).toMap
      val got = UnigramOps.segment(w, UnigramOps.table(
        if (vocab.nonEmpty) vocab.toSeq.sortBy(_._1) else Seq("z" -> -1L))).toList
      val gotScore = score(got, vocab)
      val best = allSegmentations(cps).flatMap(seg => score(seg, vocab).map(seg -> _))
      assert(best.nonEmpty, s"trial $trial: no admissible segmentation of '$w'")
      val maxScore = best.map(_._2).max
      // optimality: the DP's segmentation is admissible and attains the max
      assert(gotScore.contains(maxScore),
        s"trial $trial: '$w' got $got (score $gotScore), brute max $maxScore under $vocab")
      // tie-break: among max-scoring segmentations, the DP picks the one
      // whose FINAL pieces are longest, applied right-to-left (smallest
      // start index wins at every position) — lexicographically maximal
      // piece-length suffix
      val winners = best.filter(_._2 == maxScore).map(_._1)
      val expected = winners.minBy(seg =>
        seg.reverse.map(p => -p.length): Seq[Int])(
        Ordering.Implicits.seqOrdering[Seq, Int])
      assert(got == expected,
        s"trial $trial: tie-break diverged on '$w': got $got, expected $expected of $winners")
      // and the independent twin DP agrees exactly
      assert(UnigramOps.segmentLocal(w, vocab) == got,
        s"trial $trial: twin DP diverged on '$w'")
    }
  }

  test("trainLocal invariants on random corpora: coverage, well-formedness, prune bound") {
    val rnd = new Random(99)
    for (_ <- 1 to 30) {
      val words = Seq.fill(8 + rnd.nextInt(20))(
        Seq.fill(1 + rnd.nextInt(7))("abcd"(rnd.nextInt(4))).mkString)
      val counts = words.groupBy(identity).map { case (w, g) =>
        w -> (g.size.toLong * (1 + rnd.nextInt(5)))
      }
      val p = UnigramOps.Params(maxPieceLen = 3, minCount = 1L + rnd.nextInt(3),
        seedSize = 5 + rnd.nextInt(30), emIters = rnd.nextInt(3),
        vocabSize = 4 + rnd.nextInt(30))
      val vocab = UnigramOps.trainLocal(counts, p)
      val pieces = vocab.map(_._1)
      val singles = counts.keySet.flatMap(_.toSeq).map(_.toString)
      // every corpus code point survives every prune (coverage)
      assert(singles.subsetOf(pieces.toSet))
      // distinct pieces, strictly negative quantized log-probs
      assert(pieces.distinct.size == pieces.size && vocab.forall(_._2 < 0L))
      // prune bound: at most max(vocabSize, |singles|) pieces
      assert(pieces.size <= math.max(p.vocabSize, singles.size))
      // scores are a proper distribution up to quantization: exp sums ~ 1
      val mass = vocab.map { case (_, q) => math.exp(q.toDouble / 1e9) }.sum
      assert(mass > 0.99 && mass < 1.01, s"prob mass $mass")
    }
  }
}
