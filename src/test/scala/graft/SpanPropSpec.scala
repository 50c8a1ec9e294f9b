package graft

import scala.util.Random

import graft.operators.Dedup

/** Randomized properties for the duplicated-span family (d16/d17),
  * checked against a naive in-memory reference over a 3-symbol
  * alphabet — small enough that window collisions, merges at exactly
  * gap = L, whole-doc coverage, and cross-doc ownership chains all
  * occur constantly rather than by fixture design. Seeded generators,
  * deterministic runs. */
class SpanPropSpec extends SparkSpec {

  import spark.implicits._

  private def toks(s: String): Vector[String] =
    s.split("\\s+").filter(_.nonEmpty).toVector

  /** All stride-1 windows as (id, pos, window string). */
  private def windows(
      docs: Seq[(Long, String)], L: Int): Seq[(Long, Int, String)] =
    for {
      (id, t) <- docs
      ts = toks(t)
      p <- 0 to ts.length - L
    } yield (id, p, ts.slice(p, p + L).mkString(" "))

  /** Merge sorted duplicate positions into maximal [s, e] token spans. */
  private def mergeSpans(ps: Seq[Int], L: Int): Seq[(Int, Int)] =
    ps.sorted.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
      acc.lastOption match {
        case Some((s, e)) if p <= (e - L + 1) + L => acc.init :+ (s, p + L - 1)
        case _ => acc :+ (p, p + L - 1)
      }
    }

  /** Naive [[Dedup.duplicatedSpans]]: a window is duplicated when its
    * string occurs >= 2 times anywhere in the corpus. */
  private def naiveProfile(
      docs: Seq[(Long, String)], L: Int): Map[Long, (Long, Long, Long, Long, Long)] = {
    val wins = windows(docs, L)
    val counts = wins.groupBy(_._3).map { case (g, ws) => g -> ws.size }
    docs.map { case (id, t) =>
      val ts = toks(t)
      val nw = math.max(ts.length - L + 1, 0)
      val dups = wins.collect { case (i, p, g) if i == id && counts(g) > 1 => p }
      val spans = mergeSpans(dups, L)
      id -> ((ts.length.toLong, nw.toLong, dups.size.toLong,
        spans.size.toLong, spans.map { case (s, e) => e - s + 1 }.sum.toLong))
    }.toMap
  }

  /** Naive [[Dedup.removeDuplicatedSpans]]: every occurrence except the
    * (id, pos)-minimal one marks its range; covered tokens are cut. */
  private def naiveRemoval(
      docs: Seq[(Long, String)], L: Int): Map[Long, (Long, Long, String)] = {
    val wins = windows(docs, L)
    val firstOf = wins.groupBy(_._3).map { case (g, ws) =>
      g -> ws.map(w => (w._1, w._2)).min
    }
    docs.map { case (id, t) =>
      val ts = toks(t)
      val repeats = wins.collect {
        case (i, p, g) if i == id && firstOf(g) != ((i, p)) => p
      }
      val covered = mergeSpans(repeats, L)
        .flatMap { case (s, e) => s to e }.toSet
      val kept = ts.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> ((ts.length.toLong, (ts.length - kept.length).toLong, kept.mkString(" ")))
    }.toMap
  }

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String)] =
    Seq.tabulate(nDocs) { i =>
      val len = rnd.nextInt(16) // includes empty docs
      (i.toLong, Seq.fill(len)("abc" (rnd.nextInt(3)).toString).mkString(" "))
    }

  test("duplicatedSpans equals the naive reference on random 3-symbol corpora") {
    val rnd = new Random(1616)
    for (round <- 1 to 3; l <- Seq(1, 2, 3)) {
      val docs = randomCorpus(rnd, 30)
      val expected = naiveProfile(docs, l)
      val got = Dedup
        .duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", windowTokens = l)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      assert(got == expected, s"round $round L=$l\ndocs=$docs")
    }
  }

  test("removeDuplicatedSpans equals the naive reference on random 3-symbol corpora") {
    val rnd = new Random(1717)
    for (round <- 1 to 3; l <- Seq(1, 2, 3)) {
      val docs = randomCorpus(rnd, 30)
      val expected = naiveRemoval(docs, l)
      val got = Dedup
        .removeDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", windowTokens = l)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expected, s"round $round L=$l\ndocs=$docs")
    }
  }
}
