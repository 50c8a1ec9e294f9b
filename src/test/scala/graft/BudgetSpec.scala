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
}
