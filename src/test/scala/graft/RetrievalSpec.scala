package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** BM25 semantics + determinism ([[graft.operators.Retrieval]]). */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = Seq(
    (1L, "cat cat cat dog filler filler filler filler"),
    (2L, "cat dog filler filler filler filler filler filler"),
    (3L, "filler filler filler filler filler filler filler filler"),
    (4L, "cat dog")
  ).toDF("id", "text")

  test("more matching occurrences rank higher at equal length; non-matching docs absent") {
    val got = Retrieval.bm25TopK(docs, "id", "text", Seq("cat", "dog"), k = 10)
      .select("id").as[Long].collect().toSeq
    // doc 4 is short (high per-term weight), doc 1 has tf=3 — both beat doc 2;
    // doc 3 matches nothing and must not appear
    assert(!got.contains(3L))
    assert(got.indexOf(1L) < got.indexOf(2L))
    assert(got.indexOf(4L) < got.indexOf(2L))
  }

  test("scores are bit-identical under repartitioning (order-independent summation)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(df, "id", "text", Seq("cat", "dog"), k = 10)
        .as[(Long, Double)].collect().toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = Retrieval.bm25TopK(docs, "id", "text", Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("unigram LM score: repeated common tokens score higher; bit-identical under repartitioning") {
    import graft.operators.TfIdf
    def run(df: org.apache.spark.sql.DataFrame) =
      TfIdf.unigramLmScore(df, "id", "text")
        .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val base = run(docs)
    // every mean log-prob is negative; the all-"filler" doc 3 uses only
    // the most frequent token so it must score highest
    assert(base.forall(_._3 < 0.0))
    val best = base.maxBy(_._3)._1
    assert(best == 3L, base.mkString(", "))
    assert(base == run(docs.repartition(7)))
    graft.plans.PlanAudit.assertScalable(TfIdf.unigramLmScore(docs, "id", "text"))
  }

  test("KL drift: non-negative, zero for a corpus-identical source, drifted source largest") {
    import graft.operators.TfIdf
    val sources = Seq(
      ("a", "cat dog cat dog"),
      ("b", "cat dog cat dog"),
      ("c", "zebra zebra zebra zebra")
    ).toDF("source", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TfIdf.klDrift(df, "source", "text")
        .orderBy("source").as[(String, Long, Double)].collect().toSeq
    val got = run(sources)
    assert(got.forall(_._3 >= 0.0), got.mkString(", "))
    // a and b share one distribution; c is pure drift and must dominate
    assert(got(0)._3 == got(1)._3)
    assert(got(2)._3 > got(0)._3)
    assert(got == run(sources.repartition(5)))
    graft.plans.PlanAudit.assertScalable(TfIdf.klDrift(sources, "source", "text"))
  }

  test("inverted index: full stats, capped ascending postings, minDf gate") {
    import graft.operators.Retrieval
    val docs = Seq(
      (3L, "b a a"),
      (1L, "a b b c"),
      (2L, "a rare")
    ).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text",
      minDf = 2L, maxPostings = 2)
    val byTerm = idx.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // df/cf reflect the FULL corpus even when postings are capped
    assert(byTerm("a") == ((3L, 4L, "1:1,2:1")))
    assert(byTerm("b") == ((2L, 3L, "1:2,3:1")))
    // 'c' and 'rare' have df=1 < minDf
    assert(!byTerm.contains("c") && !byTerm.contains("rare"))
    // the cap is a keyed WindowGroupLimit, not a global window or collect
    val plan = Retrieval.invertedIndex(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    graft.plans.PlanAudit.assertScalable(
      Retrieval.invertedIndex(docs, "doc_id", "text"))
  }

  test("stupid backoff: every arm of the chain fires with the hand-computed score") {
    import graft.operators.TfIdf
    // train counts: tri "a b c":2 "b c a":1 "c a b":1; big "a b":2 "b c":2
    // "c a":1; uni a/b/c = 2 each, N = 6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c"), // seen trigram: S = 2/2 = 1 -> ln 0
      (2L, "x a b"), // backoff to bigram "a b": S = .4*(2/2)
      (3L, "x y c"), // backoff to unigram c:   S = .4*(.4*(2/6))
      (4L, "x y z"), // OOV floor:              S = .4*(.4*(1/6))
      (5L, "a b") // < 3 tokens: no row
    ).toDF("doc_id", "text")
    def run(t: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      TfIdf.stupidBackoffScore(t, e, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val got = run(train, eval)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(got.forall(_._2 == 1L))
    val expected = Seq(
      0.0,
      math.log(0.4),
      math.log(0.4 * (0.4 * (2.0 / 6.0))),
      math.log(0.4 * (0.4 * (1.0 / 6.0))))
    got.map(_._3).zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"got $g expected $e")
    }
    // strictly decreasing: each extra backoff level costs score
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got == run(train.repartition(5), eval.repartition(7)))
    graft.plans.PlanAudit.assertScalable(
      TfIdf.stupidBackoffScore(train, eval, "doc_id", "text"))
  }

  test("rrfFusion: exact quantized sums, agreement count, id tie-break, per-key top-k") {
    // query 1: lexical (101, 102), dense (102, 103); query 2: both rank 201 first
    val lex = Seq((1L, 101L, 1L), (1L, 102L, 2L), (2L, 201L, 1L), (2L, 202L, 2L))
      .toDF("qid", "doc", "rank")
    val dense = Seq((1L, 102L, 1L), (1L, 103L, 2L), (2L, 201L, 1L), (2L, 203L, 2L))
      .toDF("qid", "doc", "rank")
    def c(r: Long): Long = math.round(1e12 / (60.0 + r))
    val got = Retrieval
      .rrfFusion(Seq(lex, dense), "doc", "rank", k = 2, keyCols = Seq("qid"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 102 is in both lists (ranks 2 and 1) and must fuse above either
    // single-list doc; 101 (rank 1) beats 103 (rank 2)
    assert(got((1L, 1)) == (102L, c(2) + c(1), 2L), got)
    assert(got((1L, 2)) == (101L, c(1), 1L))
    assert(!got.values.exists(_._1 == 103L), "k=2 must cut the third doc")
    // equal fused scores (202 vs 203, one rank-2 hit each) tie to the
    // smaller id — and only k=2 rows survive per query
    assert(got((2L, 1)) == (201L, c(1) + c(1), 2L))
    assert(got((2L, 2)) == (202L, c(2), 1L))
    // fused scores are exact longs: bit-identical under repartitioning
    val again = Retrieval
      .rrfFusion(Seq(lex.repartition(7), dense.repartition(3)),
        "doc", "rank", k = 2, keyCols = Seq("qid"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == got)
    // a keyless fusion would need an unpartitioned top-k window: refused
    intercept[IllegalArgumentException] {
      Retrieval.rrfFusion(Seq(lex), "doc", "rank", k = 2, keyCols = Nil)
    }
  }

  test("rankingMetrics: hand-computed MRR/precision/nDCG, degenerate queries, determinism") {
    val w = (1 to 5).map(r => math.log(2.0) / math.log(r + 1.0))
    // q1: all 5 relevant (the perfect ranking); q2: none; q3: only rank 3
    // relevant; q4: relevant at ranks 1 and 4
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 1L), (1L, 3, 1L), (1L, 4, 1L), (1L, 5, 1L),
      (2L, 1, 0L), (2L, 2, 0L), (2L, 3, 0L), (2L, 4, 0L), (2L, 5, 0L),
      (3L, 1, 0L), (3L, 2, 0L), (3L, 3, 1L), (3L, 4, 0L), (3L, 5, 0L),
      (4L, 1, 1L), (4L, 2, 0L), (4L, 3, 0L), (4L, 4, 1L), (4L, 5, 0L)
    ).toDF("qid", "rank", "rel")
    def run(df: org.apache.spark.sql.DataFrame) = Retrieval
      .rankingMetrics(df, "qid", "rank", "rel", k = 5)
      .orderBy("query_id")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val got = run(ranked)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == (5L, 1.0, 1.0, 1.0)) // perfect ranking: nDCG exactly 1
    assert(got(2L) == (0L, 0.0, 0.0, 0.0)) // nothing relevant: all zeros
    assert(got(3L) == (1L, r6(1.0 / 3.0), 0.2, r6(w(2) / w(0))))
    assert(got(4L) == (2L, 1.0, 0.4, r6((w(0) + w(3)) / (w(0) + w(1)))))
    assert(run(ranked.repartition(7)) == got)
  }

  test("perplexityBuckets: value-threshold terciles per group, ties share a bucket") {
    import graft.operators.TfIdf
    import org.apache.spark.sql.functions.col
    // group a: 9 distinct scores -> exact terciles 3/3/3
    // group b: 6 docs, the top FOUR tie -> all four land in head
    val scored = ((1 to 9).map(i => (i.toLong, "a", i.toDouble / 10.0)) ++
      Seq((11L, "b", 0.9), (12L, "b", 0.9), (13L, "b", 0.9), (14L, "b", 0.9),
        (15L, "b", 0.2), (16L, "b", 0.1))).toDF("id", "grp", "sc")
    val out = TfIdf.perplexityBuckets(scored, "id", "grp", "sc")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    // a: 0.9/0.8/0.7 head; 0.6/0.5/0.4 middle; rest tail
    assert(Seq(9L, 8L, 7L).forall(out(_) == "head"))
    assert(Seq(6L, 5L, 4L).forall(out(_) == "middle"))
    assert(Seq(3L, 2L, 1L).forall(out(_) == "tail"))
    // b: c1 = score of 2nd best = 0.9 -> the whole tie is head; c2 =
    // score of the 4th best = 0.9 too, so middle is empty above 0.2
    assert(Seq(11L, 12L, 13L, 14L).forall(out(_) == "head"))
    assert(out(15L) == "tail" || out(15L) == "middle")
    assert(out(16L) == "tail")
    // partitioning-invariant
    val out2 = TfIdf.perplexityBuckets(scored.repartition(13), "id", "grp", "sc")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    assert(out == out2)
    graft.plans.PlanAudit.assertScalable(
      TfIdf.perplexityBuckets(scored, "id", "grp", "sc"))
  }
}
