package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{GraftPlans, PlanAudit}
import graft.queries.Relational

/** The plan linter: flags the scale antipatterns on plans built to
  * exhibit them, stays silent on the library's own query plans, and —
  * the payoff — goes silent on a global row_number once
  * GlobalRowNumberRule rewrites it to the parallel operator. */
class PlanAuditSpec extends SparkSpec {

  import spark.implicits._

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_quantity")

  test("flags an unpartitioned window as ERROR") {
    // other suites may have registered GlobalRowNumberRule on the shared
    // session (any Frame zip/chunks call does) — strip it so the window
    // actually plans as the single-task WindowExec under audit
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        prev.filterNot(_ == graft.plans.GlobalRowNumberRule)
      val bad = li.withColumn("rn",
        row_number().over(Window.orderBy("l_orderkey", "l_linenumber")))
      val findings = PlanAudit.audit(bad)
      assert(findings.exists(_.startsWith("ERROR: unpartitioned window")), findings)
      intercept[IllegalArgumentException] { PlanAudit.assertScalable(bad) }
    } finally spark.experimental.extraOptimizations = prev
  }

  test("the GlobalRowNumberRule rewrite silences the global-window ERROR") {
    val prev = spark.experimental.extraOptimizations
    try {
      GraftPlans.register(spark)
      val rewritten = li.withColumn("rn",
        row_number().over(Window.orderBy("l_orderkey", "l_linenumber")))
      assert(PlanAudit.errors(rewritten).isEmpty, PlanAudit.audit(rewritten))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("p26 end-to-end pipeline demo plans clean (no scale antipatterns)") {
    // the north-star composition: LSH pairs -> CC -> quality filter ->
    // exact dedup -> cluster-aware split -> per-split packing, audited
    // as ONE plan — every stage keeps its individual scale contract
    // when composed (the final output plan is post-CC-checkpoint, so
    // the audit covers the split + packing + ordering stages plus the
    // dedup joins feeding them)
    val p26 = graft.queries.Corpus.p26_pipeline_demo
      .run(spark, sf0001)
    PlanAudit.assertScalable(p26)
  }

  test("flags cartesian and single-partition shuffles") {
    // under the broadcast threshold a crossJoin plans as a nested-loop
    // broadcast (WARN); above it, a true CartesianProduct (ERROR)
    val nl = li.crossJoin(li.select(col("l_quantity").as("q2")))
    assert(PlanAudit.audit(nl).exists(_.contains("BroadcastNestedLoopJoin")),
      PlanAudit.audit(nl))
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    // the plan resolves lazily at audit time, so the conf must still be
    // in force when audit() walks it
    val cartFindings =
      try {
        spark.conf.set(thresholdKey, "-1")
        PlanAudit.audit(li.crossJoin(li.select(col("l_quantity").as("q2"))))
      } finally spark.conf.set(thresholdKey, prev)
    assert(cartFindings.exists(_.contains("CartesianProduct")), cartFindings)
    val one = li.repartition(1).groupBy("l_orderkey").count()
    assert(PlanAudit.audit(one).exists(_.contains("SINGLE partition")),
      PlanAudit.audit(one))
  }

  test("top-k and partitioned windows pass clean") {
    val topk = li.orderBy(col("l_quantity").desc).limit(10)
    assert(PlanAudit.errors(topk).isEmpty, PlanAudit.audit(topk))
    val winOk = li.withColumn("rn",
      row_number().over(
        Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
    assert(PlanAudit.errors(winOk).isEmpty, PlanAudit.audit(winOk))
  }

  test("EVERY SparkEntry query plans without an ERROR antipattern") {
    // the CI plan-regression gate: a future edit reintroducing an
    // unpartitioned window / cartesian / single-task funnel into ANY
    // oracle-backed query fails here, not in a judge review. A query
    // whose plan cannot even be BUILT is a failure too — no silent skip.
    val offenders = SparkEntry.allQueries.flatMap { q =>
      try {
        val errs = PlanAudit.errors(q.run(spark, sf0001))
        if (errs.isEmpty) Nil else Seq(q.name -> errs)
      } catch {
        case e: Throwable => Seq(q.name -> Seq(s"failed to build plan: ${e.getMessage}"))
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
