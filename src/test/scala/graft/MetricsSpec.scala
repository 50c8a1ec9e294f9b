package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Metrics}

/** One-pass stage telemetry: counters observed inside a single action
  * equal the independently recomputed per-stage counts, and the whole
  * instrumented pipeline executes exactly one job over the corpus. */
class MetricsSpec extends SparkSpec {

  test("stage counters from ONE action match recomputed per-stage counts") {
    import graft.functions.TextFunctions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"),
        tokenCount(col("text")).cast("long").as("nt"))

    val (scored, mScored) = Metrics.stage(
      docs.filter(col("nt") >= 50), "scored",
      count(lit(1)).as("rows"), sum(col("nt")).as("tokens"))
    val (en, mEn) = Metrics.stage(
      scored.filter(col("lang") === "en"), "en_only",
      count(lit(1)).as("rows"))
    val deduped = Dedup.exact(
      en.withColumn("norm", lower(trim(col("text")))), Seq("norm"), "doc_id")
    val (out, mOut) = Metrics.stage(deduped, "deduped",
      count(lit(1)).as("rows"))

    out.write.format("noop").mode("overwrite").save() // the ONE action

    val wantScored = docs.filter(col("nt") >= 50)
    assert(mScored.get("rows") == wantScored.count())
    assert(mScored.get("tokens") ==
      wantScored.agg(sum("nt")).head.getLong(0))
    val wantEn = wantScored.filter(col("lang") === "en")
    assert(mEn.get("rows") == wantEn.count())
    assert(mOut.get("rows") ==
      Dedup.exact(
        wantEn.withColumn("norm", lower(trim(col("text")))),
        Seq("norm"), "doc_id").count())
    // funnel is real: each stage strictly narrows on this corpus
    assert(mScored.get("rows").asInstanceOf[Long] > mEn.get("rows").asInstanceOf[Long])
  }
}
