package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Strict-order funnel: greedy chain semantics, zero-reach steps,
  * same-timestamp non-chaining, repartition stability. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val steps = Seq("signup", "view", "click", "purchase")

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
      .drop("tss")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.funnel(df, "user_id", "event_type", "ts", steps)
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq

  test("greedy chain: complete path counts each prefix; out-of-order events don't chain") {
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (1L, "click", "2024-01-01 02:00:00"),
      (1L, "purchase", "2024-01-01 03:00:00"),
      // user 2: view before signup -> stops at signup
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-01 01:00:00"),
      // user 3: never signed up -> contributes nothing
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "purchase", "2024-01-01 01:00:00"))
    assert(run(df) == Seq(
      (1, "signup", 2L, None, Some(1.0)),
      (2, "view", 1L, Some(0.5), Some(0.5)),
      (3, "click", 1L, Some(1.0), Some(0.5)),
      (4, "purchase", 1L, Some(1.0), Some(0.5))))
  }

  test("same-timestamp events do not chain (strictly-after semantics)") {
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 00:00:00"))
    assert(run(df) == Seq(
      (1, "signup", 1L, None, Some(1.0)),
      (2, "view", 0L, Some(0.0), Some(0.0)),
      (3, "click", 0L, None, Some(0.0)),
      (4, "purchase", 0L, None, Some(0.0))))
  }

  test("greedy (not optimal) matching: the earliest qualifying event is consumed") {
    // view@2 chains from signup@1; click@1.5 predates the view match ->
    // click unreached even though (signup@1, view@2) ... click must be
    // strictly after the MATCHED view, not after signup
    val df = ev(
      (1L, "signup", "2024-01-01 01:00:00"),
      (1L, "click", "2024-01-01 01:30:00"),
      (1L, "view", "2024-01-01 02:00:00"))
    assert(run(df) == Seq(
      (1, "signup", 1L, None, Some(1.0)),
      (2, "view", 1L, Some(1.0), Some(1.0)),
      (3, "click", 0L, Some(0.0), Some(0.0)),
      (4, "purchase", 0L, None, Some(0.0))))
  }

  test("empty input keeps the full step dimension with null conversions") {
    val df = ev()
    assert(run(df) == Seq(
      (1, "signup", 0L, None, None),
      (2, "view", 0L, None, None),
      (3, "click", 0L, None, None),
      (4, "purchase", 0L, None, None)))
  }

  test("repartition-stable") {
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (2L, "signup", "2024-01-01 00:30:00"))
    assert(run(df.repartition(7)) == run(df))
  }

  test("bad params rejected") {
    val df = ev((1L, "signup", "2024-01-01 00:00:00"))
    intercept[IllegalArgumentException](
      Funnel.funnel(df, "user_id", "event_type", "ts", Seq.empty))
    intercept[IllegalArgumentException](
      Funnel.funnel(df, "user_id", "event_type", "ts", Seq("a", "a")))
  }
}
