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
}
