package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Resample + forward-fill semantics ([[graft.operators.TimeSeries]]). */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  // key A observes hours 0, 3; key B observes hour 1 only
  lazy val observed = Seq(
    ("A", "2024-01-01 00:00:00", 10.0),
    ("A", "2024-01-01 03:00:00", 30.0),
    ("B", "2024-01-01 01:00:00", 5.0)
  ).toDF("k", "hour", "v")
    .withColumn("hour", to_timestamp(col("hour")))

  test("gaps are densified per key and forward-filled from the last observation") {
    val got = TimeSeries
      .resampleFfill(observed, Seq("k"), "hour", "1 hour", Seq("v"))
      .orderBy("k", "hour")
      .select(col("k"), hour(col("hour")).as("h"), col("v"), col("is_observed"))
      .as[(String, Int, Double, Int)]
      .collect()
      .toSeq
    assert(got == Seq(
      ("A", 0, 10.0, 1),
      ("A", 1, 10.0, 0), // gap: carried forward
      ("A", 2, 10.0, 0),
      ("A", 3, 30.0, 1),
      ("B", 1, 5.0, 1))) // B's grid is B's own span, not A's
  }

  test("non-fill columns stay null on gap rows (no accidental fill)") {
    val withExtra = observed.withColumn("n", lit(7L))
    val gaps = TimeSeries
      .resampleFfill(withExtra, Seq("k"), "hour", "1 hour", Seq("v"))
      .filter(col("is_observed") === 0)
    assert(gaps.filter(col("n").isNotNull).count() == 0)
  }

  test("plan has no scale antipattern (fill window is key-partitioned)") {
    graft.plans.PlanAudit.assertScalable(
      TimeSeries.resampleFfill(observed, Seq("k"), "hour", "1 hour", Seq("v")))
  }
}
