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

  // ---------------- median/MAD anomalies ----------------

  test("madAnomalies: hand-checked Hampel flags, MAD=0 convention, even-count medians") {
    val rows = Seq(
      // key a: constant but for one spike — MAD = 0, Hampel emits nothing
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 1.0),
      ("a", 5L, 100.0),
      // key b: med=3.0, MAD=1.0 — only the 100.0 exceeds 3.5·MAD
      ("b", 6L, 1.0), ("b", 7L, 2.0), ("b", 8L, 3.0), ("b", 9L, 4.0),
      ("b", 10L, 100.0),
      // key c: even count, half-integer median (1.5); devs tie — no flags
      ("c", 11L, 1.0), ("c", 12L, 2.0)
    ).toDF("k", "id", "v")
    val out = TimeSeries.madAnomalies(rows, "k", "v", threshold = 3.5)
      .collect()
    assert(out.map(r => (r.getAs[String]("k"), r.getAs[Long]("id"))).toSet ==
      Set(("b", 10L)))
    // score = dev2/mad2 = 19400/200 = 97 in doubled-cent units
    assert(out.head.getAs[Double]("score") == 97.0)
  }

  test("madAnomalies: partitioning-invariant; plan scalable; bad params rejected") {
    val rows = (1 to 300)
      .map(i => (s"k${i % 3}", i.toLong, if (i % 50 == 0) 900.0 else (i % 7).toDouble))
      .toDF("k", "id", "v")
    val a = TimeSeries.madAnomalies(rows, "k", "v").orderBy("id").collect().toSeq
    val b = TimeSeries.madAnomalies(rows.repartition(11), "k", "v")
      .orderBy("id").collect().toSeq
    assert(a == b && a.nonEmpty)
    graft.plans.PlanAudit.assertScalable(TimeSeries.madAnomalies(rows, "k", "v"))
    intercept[IllegalArgumentException](
      TimeSeries.madAnomalies(rows, "k", "v", threshold = 0.0))
    intercept[IllegalArgumentException](
      TimeSeries.madAnomalies(rows, "k", "v", scale = 0L))
  }

  test("dailyTrend: exact line recovered, zero-filled gap days, single-day nulls") {
    def at(d: Int) = s"2024-01-${"%02d".format(d)} 12:00:00"
    // key a: y = 100 + 50d exactly over days 0..3 -> slope 50, r2 1;
    // key b: days 0 and 2 observed, day 1 missing -> y = (70, 0, 10)
    val rows = Seq(
      ("a", at(1), 100L), ("a", at(2), 150L), ("a", at(3), 200L),
      ("a", at(4), 250L),
      ("b", at(1), 70L), ("b", at(3), 10L))
      .toDF("k", "tss", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.dailyTrend(df, "k", "ts", "v")
        .orderBy(col("k"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSeq
    val got = run(rows)
    // the global grid spans days 0..3 for BOTH keys
    assert(got.head == ("a", 4L, Some(50.0), Some(100.0), Some(1.0)))
    // b: points (0,70),(1,0),(2,10),(3,0): sxy=20, so
    // slope = (4*20-6*80)/(4*14-36) = -20; intercept = 20-(-20)*1.5 = 50
    assert(got(1)._1 == "b" && got(1)._3 == Some(-20.0) &&
      got(1)._4 == Some(50.0))
    assert(run(rows.repartition(7)) == got)
    // a single-day range has no x-variance: null statistics
    val oneDay = Seq(("a", at(1), 5L)).toDF("k", "tss", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    assert(run(oneDay) == Seq(("a", 1L, None, None, None)))
  }

  test("ewmaSpikes: hand-computed recurrence, zero-filled gap hours, per-key independence") {
    def at(h: Int) = s"2024-01-01 ${"%02d".format(h)}:30:00"
    // key a: 8 events in hour 0, NOTHING in hour 1 (a silent gap — the
    // anomaly), 16 events in hour 2; key b: constant 4 per hour
    val rows = (
      Seq.fill(8)(("a", at(0))) ++ Seq.fill(16)(("a", at(2))) ++
        (0 to 2).flatMap(h => Seq.fill(4)(("b", at(h)))))
      .toDF("k", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.ewmaSpikes(df, "k", "ts")
        .orderBy(col("k"), col("hour_epoch_s"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .toSeq
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L
    // a: s0=8e6; gap hour dev=8e6 > s0/2 -> spike, s1=(7*8e6)/8=7e6;
    //    burst dev=|16e6-7e6|=9e6 > 3.5e6 -> spike, s2=(49e6+16e6)/8
    // b: constant rate never deviates
    assert(run(rows) == Seq(
      ("a", h0, 8L, 8000000L, false),
      ("a", h0 + 3600, 0L, 7000000L, true),
      ("a", h0 + 7200, 16L, 8125000L, true),
      ("b", h0, 4L, 4000000L, false),
      ("b", h0 + 3600, 4L, 4000000L, false),
      ("b", h0 + 7200, 4L, 4000000L, false)))
    assert(run(rows.repartition(13)) == run(rows))
    val empty = Seq.empty[(String, String)].toDF("k", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    assert(TimeSeries.ewmaSpikes(empty, "k", "ts").count() == 0L)
    intercept[IllegalArgumentException](
      TimeSeries.ewmaSpikes(rows, "k", "ts", alphaDen = 1L))
  }
}
