package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{ngrams, tokens}

/** Edge cases of the scan-local n-gram generator. */
class NgramSpec extends SparkSpec {

  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(ngrams(tokens(col("t")), n).as("g"))
      .collect().head.getSeq[String](0)

  test("bigrams slide over full windows only") {
    assert(grams("a b c d", 2) == Seq("a b", "b c", "c d"))
    assert(grams("a b c d", 3) == Seq("a b c", "b c d"))
  }

  test("short and empty documents yield no n-grams") {
    assert(grams("solo", 2).isEmpty)
    assert(grams("", 2).isEmpty)
    assert(grams("a b", 4).isEmpty)
  }

  test("n=1 is the token stream; n>=1 enforced") {
    assert(grams("x  y\tz", 1) == Seq("x", "y", "z"))
    intercept[IllegalArgumentException](ngrams(col("t"), 0))
  }

  test("vocabOverlapMatrix: exact Jaccard/containment grid, zero-overlap pairs kept") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "c d"),     // vocab {a,b,c,d}
      ("s2", "c d e"),                    // vocab {c,d,e}
      ("s3", "x y"))                      // vocab {x,y} — disjoint
      .toDF("source", "text")
    val got = graft.operators.TfIdf.vocabOverlapMatrix(docs, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // complete upper-triangle grid over 3 sources
    assert(got.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    // s1 ∩ s2 = {c,d}: J = 2/(4+3-2) = 0.4; containment = 2/3
    assert(got(("s1", "s2")) == (4L, 3L, 2L, 0.4, 0.666667))
    // disjoint pairs present with zeros
    assert(got(("s1", "s3")) == (4L, 2L, 0L, 0.0, 0.0))
    assert(got(("s2", "s3")) == (3L, 2L, 0L, 0.0, 0.0))
  }

  test("distinctN: exact type/token ratios per group and order") {
    val docs = Seq(
      ("a", "x x x x"), ("a", "x y"), ("b", "p q r"))
      .toDF("source", "text")
    val got = graft.operators.TfIdf.distinctN(docs, "source", "text", maxN = 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // a: unigrams x*5 y*1; bigrams "x x"*3 "x y"*1; trigrams "x x x"*2
    assert(got(("a", 1)) == (2L, 6L, 0.333333))
    assert(got(("a", 2)) == (2L, 4L, 0.5))
    assert(got(("a", 3)) == (1L, 2L, 0.5))
    // b: all orders fully diverse
    assert(got(("b", 1)) == (3L, 3L, 1.0))
    assert(got(("b", 2)) == (2L, 2L, 1.0))
    assert(got(("b", 3)) == (1L, 1L, 1.0))
    assert(got.size == 6)
  }

  test("termBurstiness: clumped vs uniform hand values, min-df floor, repartition-stable") {
    // "x" appears once in each of 4 docs (uniform: dispersion 0);
    // "s" appears 4 times in one doc and once in another (bursty)
    val docs = Seq(
      (1L, "x s s s s"), (2L, "x s"), (3L, "x"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = graft.operators.TfIdf
      .termBurstiness(docs, "doc_id", "text", minDf = 2L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    // s: df=2 cf=5 m2=17 -> mean 2.5, var (17-12.5)/2 = 2.25,
    //    dispersion 0.9; x: df=4 cf=4 -> burstiness 1, dispersion 0
    assert(got == Seq(
      ("s", 2L, 5L, 2.5, 0.9), ("x", 4L, 4L, 1.0, 0.0)))
    // min-df floors rare terms out entirely
    assert(!graft.operators.TfIdf
      .termBurstiness(docs, "doc_id", "text", minDf = 3L, topK = 10)
      .collect().map(_.getString(0)).contains("s"))
    val again = graft.operators.TfIdf
      .termBurstiness(docs.repartition(7), "doc_id", "text", 2L, 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(again == got)
    intercept[IllegalArgumentException](
      graft.operators.TfIdf.termBurstiness(docs, "doc_id", "text", 0L, 10))
  }

  test("vocabGrowthCurve: first occurrences drive types, empty buckets kept, cumulative exact") {
    // ids 0..3 over 2 buckets: bucket 1 = {0,1}, bucket 2 = {2,3}
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), (2L, "a b d"), (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.TfIdf
      .vocabGrowthCurve(docs, "doc_id", "text", buckets = 2)
      .orderBy(col("bucket"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq
    def beta(types: Long, toks: Long) = Some(BigDecimal(
      math.log(types.toDouble) / math.log(toks.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // prefix 1: 2 docs, 4 tokens, types {a,b,c}; prefix 2: +d only
    assert(got == Seq(
      (1, 2L, 4L, 3L, beta(3, 4)),
      (2, 4L, 7L, 4L, beta(4, 7))))
    // a bucket with no docs stays, carrying the previous cumulative
    val sparse = Seq((0L, "x y"), (9L, "x z")).toDF("doc_id", "text")
    val g2 = graft.operators.TfIdf
      .vocabGrowthCurve(sparse, "doc_id", "text", buckets = 5)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).toSeq
    assert(g2 == Seq((1, 1L, 2L), (2, 1L, 2L), (3, 1L, 2L), (4, 1L, 2L),
      (5, 2L, 3L)))
    intercept[IllegalArgumentException](
      graft.operators.TfIdf.vocabGrowthCurve(docs, "doc_id", "text", 0))
  }

  test("pmiCollocations: hand-computed log-sum score, min-count floor, tie order, repartition-stable") {
    val docs = (Seq.fill(5)("new york") :+ "a b a b a b a b a b").toDF("text")
    val got = graft.operators.TfIdf
      .pmiCollocations(docs, "text", minCount = 5L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // unigrams: new=5 york=5 a=5 b=5, N=20; pairs: (new,york)=5 (a,b)=5
    // (b,a)=4 -> floored out; M=14; both survivors share count shape ->
    // identical PMI, tie breaks on word_a
    val expect = BigDecimal(
      math.log(5.0) + 2.0 * math.log(20.0) - math.log(14.0) -
        math.log(5.0) - math.log(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("a", "b", 5L, expect), ("new", "york", 5L, expect)))
    val again = graft.operators.TfIdf
      .pmiCollocations(docs.repartition(7), "text", minCount = 5L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(again == got)
    intercept[IllegalArgumentException](
      graft.operators.TfIdf.pmiCollocations(docs, "text", 0L, 10))
  }

  test("textRankKeywords: hand-computed path-graph round; self/duplicate pairs collapse; repartition-stable") {
    def run(texts: Seq[String], iters: Int) =
      graft.operators.TfIdf
        .textRankKeywords(texts.toDF("text"), "text", iters = iters, topK = 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // path a-b-c: odeg a=1 b=2 c=1; one round from pr=1e6:
    //   a = 150000 + 85*(1e6 div 2) div 100 = 575000 (c symmetric)
    //   b = 150000 + 85*(1e6 + 1e6) div 100 = 1850000
    assert(run(Seq("a b c"), 1) ==
      Seq(("b", 1850000L), ("a", 575000L), ("c", 575000L)))
    // duplicate adjacencies and self-pairs don't change the graph
    assert(run(Seq("a b c", "a a b b c", "b a"), 1) == run(Seq("a b c"), 1))
    // iters=0 is the uniform seed, ordered by word on the tie
    assert(run(Seq("a b c"), 0) ==
      Seq(("a", 1000000L), ("b", 1000000L), ("c", 1000000L)))
    // single-token and empty docs contribute nothing
    assert(run(Seq("a b c", "x", ""), 1) == run(Seq("a b c"), 1))
    val many = (1 to 40).map(i => s"w$i w${i + 1} w${i + 2}")
    val df = many.toDF("text")
    val once = graft.operators.TfIdf
      .textRankKeywords(df, "text", iters = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val again = graft.operators.TfIdf
      .textRankKeywords(df.repartition(7), "text", iters = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(once == again)
  }
}
