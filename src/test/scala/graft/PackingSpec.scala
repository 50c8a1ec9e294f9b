package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Ground truth for the distributed prefix sum and sequence packing:
  * equality with the single-task window formulation, invariance under
  * input partitioning, the packing contract (contiguous windows, correct
  * straddling), and the running-sum optimizer rewrite. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    // (id, n_tokens) — sizes chosen to straddle the 10-token windows
    (1L, 4L), (2L, 3L), (3L, 6L), (4L, 10L), (5L, 1L),
    (6L, 12L), (7L, 2L), (8L, 7L), (9L, 5L), (10L, 9L))

  test("withPrefixSum equals the window formulation and is partition-invariant") {
    def prefix(parts: Int) = Frame
      .withPrefixSum(
        docs.toDF("id", "nt").repartition(parts),
        Seq(col("id")), col("nt"), "idx", "off")
      .select("id", "idx", "off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val viaWindow = docs.toDF("id", "nt")
      .withColumn("idx", row_number().over(Window.orderBy("id")) - 1)
      .withColumn(
        "off",
        coalesce(
          sum("nt").over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("id", "idx", "off")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSeq.sorted
    assert(prefix(1) == viaWindow)
    assert(prefix(7) == viaWindow)
  }

  test("packSequences: windows are contiguous and straddling is exact") {
    val packed = Packing
      .packSequences(docs.toDF("id", "nt"), "nt", seqLen = 10, order = Seq(col("id")))
      .orderBy("id")
      .collect().map(r => (
        r.getLong(0), r.getLong(1),
        r.getLong(r.fieldIndex("pack_id")),
        r.getLong(r.fieldIndex("pack_offset")),
        r.getLong(r.fieldIndex("end_pack"))))
    // total 59 tokens -> offsets 0,4,7,13,23,24,36,38,45,50
    val want = Seq(
      (1L, 4L, 0L, 0L, 0L), (2L, 3L, 0L, 4L, 0L), (3L, 6L, 0L, 7L, 1L),
      (4L, 10L, 1L, 3L, 2L), (5L, 1L, 2L, 3L, 2L), (6L, 12L, 2L, 4L, 3L),
      (7L, 2L, 3L, 6L, 3L), (8L, 7L, 3L, 8L, 4L), (9L, 5L, 4L, 5L, 4L),
      (10L, 9L, 5L, 0L, 5L))
    assert(packed.toSeq == want)
    // a doc straddles iff its tokens cross a multiple of seqLen
    packed.foreach { case (_, nt, p, o, e) =>
      assert(e == p + (o + nt - 1) / 10 - o / 10)
    }
  }

  test("packTokens agrees with packSequences; windows dense; concat order preserved") {
    val corpus = Tables(spark, "/root/testdata/sf0.001").documents.limit(40)
    val merges = graft.operators.Bpe.referenceMerges
    val toks = Packing.packTokens(corpus, "doc_id", "text", merges, seqLen = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(toks.length > 500)
    // the global stream is dense: (seq_id, seq_pos) enumerate 0..n-1
    val stream = toks.sortBy(t => (t._1, t._2))
    assert(stream.zipWithIndex.forall { case ((sid, sp, _, _), i) =>
      sid == i / 64 && sp == i % 64 })
    // both faces share the prefix-sum offsets: each doc's first/last
    // token lands exactly in packSequences' pack_id/end_pack
    val perDoc = stream.zipWithIndex.groupBy(_._1._4)
      .map { case (id, ts) => id -> (ts.head._2 / 64, ts.last._2 / 64, ts.length) }
    val faces = Packing.packSequences(
      corpus
        .select(col("doc_id"),
          aggregate(
            transform(graft.functions.TextFunctions.bpeTokens(col("text")),
              pt => graft.functions.expressions.BpeOps.bpeMergedCount(pt, merges)
                .cast("long")),
            lit(0L), (a, x) => a + x).as("n_tokens"))
        .filter(col("n_tokens") > 0),
      "n_tokens", seqLen = 64, order = Seq(col("doc_id")))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("end_pack"), r.getAs[Long]("n_tokens")))
      .toMap
    assert(perDoc.keySet == faces.keySet)
    perDoc.foreach { case (id, (first, last, n)) =>
      val (pid, ep, nt) = faces(id)
      assert(first.toLong == pid && last.toLong == ep && n.toLong == nt,
        s"doc $id: tokens say ($first,$last,$n), packSequences says ($pid,$ep,$nt)")
    }
    // concatenating a doc's tokens in stream order reassembles its
    // pretoken stream (losslessness through the pack)
    val byDoc = stream.groupBy(_._4).view.mapValues(_.map(_._3).mkString).toMap
    val texts = corpus.select(col("doc_id"),
        concat_ws("", graft.functions.TextFunctions.bpeTokens(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    byDoc.foreach { case (id, s) => assert(s == texts(id), s"doc $id reassembly") }
  }

  test("GlobalRunningSumRule rewrites a global ROWS running sum to PrefixSumExec") {
    val prev = spark.experimental.extraOptimizations
    try {
      plans.GraftPlans.register(spark)
      val df = docs.toDF("id", "nt")
      val running = df.withColumn(
        "rt",
        sum("nt").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val p = running.queryExecution.executedPlan.toString
      assert(p.contains("PrefixSum"), p.take(2000))
      assert(!p.contains("Window ["), p.take(2000))
      val got = running.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
      val expected = docs.scanLeft((0L, 0L)) { case ((_, acc), (id, nt)) => (id, acc + nt) }.tail
      assert(got.toSeq == expected)

      // RANGE-framed (default) and nullable-operand running sums are untouched
      val rangeDefault = df.withColumn("rt", sum("nt").over(Window.orderBy("id")))
      assert(!rangeDefault.queryExecution.executedPlan.toString.contains("PrefixSum"))
      val nullable = df
        .select(col("id"), when(col("nt") > 2, col("nt")).as("nt"))
        .withColumn(
          "rt",
          sum("nt").over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(!nullable.queryExecution.executedPlan.toString.contains("PrefixSum"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("lengthGroupedBatches: (len, id) order, batch boundaries, partition-invariant") {
    // sorted by (len, id): (5,1),(7,2),(2,3),(9,5),(1,4),(6,6),(10,9),(3,12)
    val d = Seq(
      (1L, 3L), (2L, 3L), (3L, 2L), (4L, 6L),
      (5L, 4L), (6L, 8L), (7L, 2L), (9L, 5L), (10L, 9L), (3L + 9L, 1L)
    ).map { case (id, len) => (id, len) }.toDF("id", "len")
    val got = Packing.lengthGroupedBatches(d, "id", "len", batchSize = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver replica of the contract: sort by (len, id), chunk by 3
    val expect = Seq(
      (1L, 3L), (2L, 3L), (3L, 2L), (4L, 6L), (5L, 4L), (6L, 8L),
      (7L, 2L), (9L, 5L), (10L, 9L), (12L, 1L))
      .sortBy { case (id, len) => (len, id) }
      .zipWithIndex
      .map { case ((id, len), i) => id -> (len, i.toLong / 3L) }
      .toMap
    assert(got == expect)
    // batches pad to their own max: audit math on the replica
    val waste = expect.values.groupBy(_._2).map { case (b, ls) =>
      b -> (ls.size * ls.map(_._1).max - ls.map(_._1).sum) }
    assert(waste.values.sum < 10L) // grouped-by-length keeps waste low
    // partition-invariant
    val again = Packing
      .lengthGroupedBatches(d.repartition(7), "id", "len", batchSize = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
    intercept[IllegalArgumentException](
      Packing.lengthGroupedBatches(d, "id", "len", batchSize = 0))
  }

  test("chatTurns: alternating roles, contiguous token offsets, loss on assistant turns") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 10L, "hello there"), (1L, 20L, "hi how can i help"),
      (1L, 30L, "fix my build"),
      (2L, 5L, "ping")).toDF("uid", "seq", "msg")
    val out = graft.operators.Packing
      .chatTurns(ev, "uid", order = Seq(col("seq").asc), contentExpr = col("msg"))
      .orderBy(col("uid"), col("turn_idx")).collect()
    val u1 = out.filter(_.getAs[Long]("uid") == 1L)
    assert(u1.map(_.getAs[String]("role")).toSeq ==
      Seq("user", "assistant", "user"))
    assert(u1.map(_.getAs[String]("rendered")).toSeq == Seq(
      "<|user|> hello there", "<|assistant|> hi how can i help",
      "<|user|> fix my build"))
    // per-turn tokens = 1 marker + content tokens; offsets contiguous
    assert(u1.map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
      .toSeq == Seq((0L, 3L), (3L, 9L), (9L, 13L)))
    assert(u1.map(_.getAs[Boolean]("loss")).toSeq == Seq(false, true, false))
    val u2 = out.filter(_.getAs[Long]("uid") == 2L)
    assert(u2.map(r => (r.getAs[String]("role"), r.getAs[Long]("tok_start"),
      r.getAs[Long]("tok_end"))).toSeq == Seq(("user", 0L, 2L)))
    // partitioning-invariant
    val out2 = graft.operators.Packing
      .chatTurns(ev.repartition(5), "uid", Seq(col("seq").asc), col("msg"))
      .orderBy(col("uid"), col("turn_idx")).collect()
    assert(out2.toSeq == out.toSeq)
  }
}
