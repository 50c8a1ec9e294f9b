package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** [[Curation.snapshotDiff]] semantics (ruleFilter is gated by the t15
  * oracle; the diff gets its spec here plus the p24 oracle). */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("snapshotDiff: added/removed/changed/unchanged partition both id spaces") {
    val before = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")
    ).toDF("id", "text")
    val after = Seq(
      (1L, "alpha"),         // unchanged
      (2L, "beta edited"),   // changed
      (4L, "delta"),         // unchanged  (3 removed)
      (5L, "epsilon")        // added
    ).toDF("id", "text")
    val got = Curation.snapshotDiff(before, after, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
    // pure function of content: repartitioning changes nothing
    val again = Curation
      .snapshotDiff(before.repartition(5), after.repartition(3), "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
    // multi-column content: a change in EITHER column is a change
    val b2 = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "t1", "t2")
    val a2 = Seq((1L, "a", "z"), (2L, "b", "y")).toDF("id", "t1", "t2")
    val got2 = Curation.snapshotDiff(b2, a2, "id", Seq("t1", "t2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(1L -> "changed", 2L -> "unchanged"))
    // identical snapshots: all unchanged, diff list empty
    assert(Curation.snapshotDiff(before, before, "id", Seq("text"))
      .filter(col("status") =!= "unchanged").count() == 0L)
  }

  test("preferencePairs: argmax/argmin pairing, tie-breaks, degenerate groups") {
    val responses = Seq(
      // g1: clear ordering
      (1L, 10L, 5L), (1L, 11L, 3L), (1L, 12L, 1L),
      // g2: all tied — no margin, dropped
      (2L, 20L, 7L), (2L, 21L, 7L),
      // g3: singleton — dropped
      (3L, 30L, 9L),
      // g4: tie at the top (ids 41 > 40 wins chosen), distinct bottom
      (4L, 40L, 9L), (4L, 41L, 9L), (4L, 42L, 2L)
    ).toDF("prompt", "resp_id", "score")
    val out = Curation.preferencePairs(responses, "prompt", "resp_id", "score")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 4L))
    val g1 = out(1L)
    assert(g1.getAs[Long]("chosen_id") == 10L &&
      g1.getAs[Long]("rejected_id") == 12L &&
      g1.getAs[Long]("margin") == 4L && g1.getAs[Long]("n_responses") == 3L)
    val g4 = out(4L)
    assert(g4.getAs[Long]("chosen_id") == 41L && // struct max: (9, 41) > (9, 40)
      g4.getAs[Long]("rejected_id") == 42L && g4.getAs[Long]("margin") == 7L)
    // partitioning-invariant (struct min/max is a total order)
    val again = Curation
      .preferencePairs(responses.repartition(7), "prompt", "resp_id", "score")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(again == out.view.mapValues(_.toSeq).toMap)
  }

  test("preferencePairs: one keyed aggregation, no scale antipattern") {
    val responses = Seq((1L, 10L, 5L), (1L, 11L, 3L)).toDF("prompt", "id", "s")
    graft.plans.PlanAudit.assertScalable(
      Curation.preferencePairs(responses, "prompt", "id", "s"))
  }

  test("blocklistFilter: word boundaries, overlap longest-first, case, validation") {
    val docs = Seq(
      (1L, "a bad apple pie"),        // overlapping phrases: ONE hit
      (2L, "an Apple a day"),         // case-insensitive single-word hit
      (3L, "scrapple and pineapple"), // substrings do NOT match (\b)
      (4L, "bad apple bad apple"),    // two hits -> blocked at maxHits=1
      (5L, "nothing here")
    ).toDF("id", "text")
    val got = Curation
      .blocklistFilter(docs, "id", "text",
        phrases = Seq("apple", "bad apple"), maxHits = 1L)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_hits"),
        r.getAs[Boolean]("blocked"))).toMap
    assert(got == Map(
      1L -> (1L, false), 2L -> (1L, false), 3L -> (0L, false),
      4L -> (2L, true), 5L -> (0L, false)))
    // phrases must be plain lowercase word sequences
    intercept[IllegalArgumentException](
      Curation.blocklistFilter(docs, "id", "text", Seq("Bad")))
    intercept[IllegalArgumentException](
      Curation.blocklistFilter(docs, "id", "text", Seq("a.c")))
    intercept[IllegalArgumentException](
      Curation.blocklistFilter(docs, "id", "text", Seq.empty))
  }

  test("blocklistFilterTrie: equals the regex face on hand traps AND the corpus fixture") {
    // the kernel's contract is EXACT agreement with the alternation
    // regex — pin it on the adversarial shapes first
    val docs = Seq(
      (1L, "a bad apple pie"),          // overlap: longest wins, ONE hit
      (2L, "an Apple a day"),           // case via lower()
      (3L, "scrapple and pineapple"),   // \b: substrings don't match
      (4L, "bad apple bad apple"),      // repeated, non-overlapping resume
      (5L, "bad apples"),               // trailing boundary fails the long
                                        // phrase, short one still hits
      (6L, "bad_apple bad"),            // underscore IS a word char: no
                                        // boundary inside bad_apple
      (7L, "x bad bad apple y"),        // match resume lands on next start
      (8L, "")
    ).toDF("id", "text")
    val phrases = Seq("apple", "bad apple", "bad")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_hits"),
        r.getAs[Boolean]("blocked"))).toMap
    val viaRegex = run(Curation.blocklistFilter(docs, "id", "text", phrases, 1L))
    val viaTrie = run(Curation.blocklistFilterTrie(docs, "id", "text", phrases, 1L))
    assert(viaTrie == viaRegex)
    // spot-check the traps are what they claim (not just face-equal)
    assert(viaTrie(5L) == (1L, false))  // "bad" hits, "bad apple(s)" doesn't
    assert(viaTrie(6L) == (1L, false))  // only the standalone "bad"
    assert(viaTrie(7L) == (2L, true))   // "bad" then "bad apple"
    // corpus fixture: both faces agree document-for-document on real
    // text with the 25-phrase adversarial dictionary
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val ph = Seq(
      "slow fast", "slow", "fast key order", "fast key", "data window",
      "window row", "the part", "part merge", "spark window", "spark",
      "batch batch", "stream", "join order", "join", "sort agg", "agg line",
      "merge data", "key data", "small hash scan", "hash scan", "big",
      "customer line", "value merge", "row data", "a")
    val a = Curation.blocklistFilter(corpus, "doc_id", "text", ph, 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Curation.blocklistFilterTrie(corpus, "doc_id", "text", ph, 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.values.sum > 0)
    intercept[IllegalArgumentException](
      Curation.blocklistFilterTrie(docs, "id", "text", Seq("Bad")))
    intercept[IllegalArgumentException](
      Curation.blocklistFilterTrie(docs, "id", "text", Seq.empty))
  }

  test("canonicalizeUrl: every variant class collapses; benign parts survive") {
    val cases = Seq(
      // scheme/host case + default port + fragment
      ("HTTPS://WWW.Example.COM:443/a/b#frag", "https://www.example.com/a/b"),
      ("http://host.com:80/x", "http://host.com/x"),
      // NON-default port survives
      ("http://host.com:8080/x", "http://host.com:8080/x"),
      // trailing slashes stripped; bare host stays bare
      ("https://h.com/a/b///", "https://h.com/a/b"),
      ("https://h.com/", "https://h.com"),
      ("https://h.com", "https://h.com"),
      // tracking params dropped, rest sorted; all-tracking -> no query
      ("https://h.com/p?utm_source=x&b=2&a=1&fbclid=z", "https://h.com/p?a=1&b=2"),
      ("https://h.com/p?utm_campaign=c&gclid=g", "https://h.com/p"),
      // ref is tracking; id and page are not
      ("https://h.com/p?ref=tw&page=3&id=7", "https://h.com/p?id=7&page=3"),
      // empty query handled
      ("https://h.com/p?", "https://h.com/p"))
    val df = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl(col("url")).as("c"))
    assert(df.collect().map(_.getString(0)).toSeq == cases.map(_._2))
  }

  test("urlDedup: variants group to one key, keeper is the smallest id") {
    val docs = Seq(
      (1L, "https://h.com/p?b=2&a=1"),
      (2L, "HTTPS://H.COM:443/p/?a=1&b=2&utm_source=x"),
      (3L, "https://h.com/p?a=1&b=2#frag"),
      (4L, "https://h.com/other")
    ).toDF("id", "url")
    val got = Curation.urlDedup(docs, "id", "url")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "https://h.com/p?a=1&b=2" -> (3L, 1L),
      "https://h.com/other" -> (1L, 4L)))
    // canonicalization is a pure projection: zero-shuffle before the agg
    graft.plans.PlanAudit.assertScalable(Curation.urlDedup(docs, "id", "url"))
  }
}
