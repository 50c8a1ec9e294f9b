package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Budget

/** The two-phase token-budget selection must equal the direct one-window
  * formulation row-for-row — including cum_tokens — on real data. */
class BudgetSpec extends SparkSpec {

  private def naive(budget: Long) = {
    val w = Window
      .partitionBy(col("lang"))
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(
        col("doc_id"), col("lang"),
        qualityScore(col("text")).as("q"),
        tokenCount(col("text")).as("nt"))
      .withColumn("cum_tokens", sum(col("nt")).over(w))
      .filter(col("cum_tokens") - col("nt") < budget)
      .select(col("lang"), col("doc_id"), col("q"), col("nt"), col("cum_tokens"))
  }

  private def scalable(budget: Long) =
    Budget.tokenBudgetSelect(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select(
          col("doc_id"), col("lang"),
          qualityScore(col("text")).as("q"),
          tokenCount(col("text")).as("nt")),
      groupCol = "lang", idCol = "doc_id", qCol = "q", ntCol = "nt",
      budget = budget)

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .collect()
    .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
      r.getAs[Double]("q"), r.getAs[Int]("nt"), r.getAs[Long]("cum_tokens")))
    .toSet

  test("two-phase budget selection equals the one-window formulation exactly") {
    for (budget <- Seq(500L, 2000L, 100000L)) {
      val a = rows(naive(budget))
      val b = rows(scalable(budget))
      assert(a == b, s"budget=$budget: ${a.size} naive vs ${b.size} scalable rows")
      assert(a.nonEmpty, s"budget=$budget selected nothing — test is vacuous")
    }
  }

  test("budget larger than the corpus keeps every document") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(scalable(100000000L).count() == n)
  }

  test("doc-level window partitions by (group, quality) — never by group alone") {
    val p = scalable(2000L).queryExecution.executedPlan.toString
    // the per-doc running-sum exchange must be keyed by the STRATUM
    // (lang, q), not by lang alone — the property that bounds each window
    // task to one quality stratum's population
    val stratumExchange = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(lang#") && l.contains("(q#"))
    assert(stratumExchange, p.take(3000))
  }

  // ---------------- waterFill ----------------

  test("waterFill: hand-checked levels, caps, remainder spread, degenerate targets") {
    import spark.implicits._
    def run(rows: Seq[(String, Long)], target: Long) =
      Budget.waterFill(rows.toDF("src", "sup"), "src", "sup", target)
        .collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("alloc"), r.getAs[Boolean]("capped"))).toMap
    // [2, 5, 100] at T=10: the 2 is taken whole, 8 splits 4/4
    val a = run(Seq(("a", 2L), ("b", 5L), ("c", 100L)), 10L)
    assert(a == Map("a" -> (2L, true), "b" -> (4L, false), "c" -> (4L, false)))
    // remainder: [10,10,10] at T=8 -> level 2, +1 to the first two
    val b = run(Seq(("x", 10L), ("y", 10L), ("z", 10L)), 8L)
    assert(b == Map("x" -> (3L, false), "y" -> (3L, false), "z" -> (2L, false)))
    assert(b.values.map(_._1).sum == 8L)
    // target >= total supply: everything taken whole
    val c = run(Seq(("a", 2L), ("b", 5L)), 100L)
    assert(c == Map("a" -> (2L, true), "b" -> (5L, true)))
    // target 0: nothing taken, nothing capped
    val d = run(Seq(("a", 2L), ("b", 5L)), 0L)
    assert(d.values.map(_._1).toSeq.sorted == Seq(0L, 0L))
    intercept[IllegalArgumentException](
      Budget.waterFill(Seq(("a", 1L)).toDF("s", "v"), "s", "v", -1L))
  }

  test("waterFill: sums hit the target exactly; partitioning-invariant; plan scalable") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"s$i", ((i * 37) % 91 + 3).toLong))
    val df = rows.toDF("src", "sup")
    val out = Budget.waterFill(df, "src", "sup", 4000L)
    val total = out.agg(sum(col("alloc"))).head.getLong(0)
    assert(total == math.min(4000L, rows.map(_._2).sum))
    val again = Budget.waterFill(df.repartition(17), "src", "sup", 4000L)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.collect().map(r => r.getString(0) -> r.toSeq).toMap)
    // max-min fairness: no uncapped source sits below another's alloc-1
    val allocs = out.filter(!col("capped")).collect().map(_.getAs[Long]("alloc"))
    if (allocs.nonEmpty) assert(allocs.max - allocs.min <= 1)
    graft.plans.PlanAudit.assertScalable(out)
  }
}
