package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular per-key observations
  * onto a dense time grid and forward-fill the gaps.
  *
  * Spark has no native resample/ffill (pandas `resample().ffill()`), yet
  * it is the standard preparation step for feature tables and training
  * curves. The composition here is scale-shaped end to end:
  *
  *   - the dense grid is generated per key with `sequence()` + `explode`
  *     from each key's own [min, max] span — grid size is
  *     sum_k(span_k / step), never global-span × all-keys, and the
  *     generator runs distributed in the scan stage of the (small,
  *     already-aggregated) span relation;
  *   - the gap join is a keyed equi-join on (keys, bucket);
  *   - forward fill is `last(ignoreNulls)` over a per-key window — a
  *     keyed shuffle + sort, NEVER an unpartitioned window.
  *
  * Every shuffle is on the key columns; nothing scales with the total
  * row count on a single task.
  */
object TimeSeries {

  /** Expand `observed` (one row per (keys, `bucket`) — pre-aggregate
    * with the step-truncated bucket before calling) to the dense grid
    * [min(bucket), max(bucket)] per key at `step` (e.g. "1 hour"), then
    * forward-fill `fillCols` from the last observed value. Adds
    * `is_observed` (1 = real observation, 0 = gap row). Non-fill value
    * columns remain null on gap rows. */
  def resampleFfill(
      observed: DataFrame,
      keys: Seq[String],
      bucket: String,
      step: String,
      fillCols: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val spans = observed
      .groupBy(k: _*)
      .agg(min(col(bucket)).as("__lo"), max(col(bucket)).as("__hi"))
    val grid = spans.select(
      k :+ explode(sequence(col("__lo"), col("__hi"), expr(s"interval $step")))
        .as(bucket): _*)
    val joined = grid.join(
      observed.withColumn("__obs", lit(1)),
      keys :+ bucket,
      "left")
    val w = Window
      .partitionBy(k: _*)
      .orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols
      .foldLeft(joined) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .withColumn("is_observed", col("__obs").isNotNull.cast("int"))
      .drop("__obs")
  }

  /** Robust per-key anomaly detection via the median/MAD rule
    * (Hampel identifier): flag rows where
    *   |v − median_key(v)| > threshold · MAD_key(v),
    * the outlier test that, unlike mean/stddev z-scores, is not itself
    * dragged by the outliers it hunts (50% breakdown point) — the
    * right default for telemetry and training-curve spike detection.
    *
    * Determinism contract: values quantize to longs at `scale`; the
    * median of longs is x.0/x.5 (exact in binary), so deviations are
    * tracked in DOUBLED units (`2·|q − 2·med/2|` — exact longs), the
    * MAD of those is again exact x.0/x.5, and the final score is one
    * double division of exact values, rounded to 6. Bit-stable under
    * any partitioning and replayable in any engine with linear
    * interpolation percentiles.
    *
    * Scale shape: two (key) aggregations (median, then MAD of the
    * deviations) + two keyed equi-joins back — all shuffles on the key
    * column. Exact `percentile` holds a per-key value-count map, fine
    * at quantized-telemetry cardinality; at 100 TB with unbounded
    * value domains swap `approx_percentile` in (same plan shape), as
    * with q61's equi-depth bins. Keys with MAD = 0 (over half the
    * values identical) emit no anomalies — the standard Hampel
    * convention, documented rather than NaN-ed. */
  def madAnomalies(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      threshold: Double = 3.5,
      scale: Long = 100L): DataFrame =
    madScore(df, madBaseline(df, keyCol, valueCol, scale),
      keyCol, valueCol, threshold, scale)

  /** The per-key robust baseline [[madAnomalies]] scores against:
    * `med2` = 2·median and `mad2` = median absolute deviation, both in
    * DOUBLED quantized units (exact longs — see the determinism
    * contract above). Key-sized; persist or broadcast it for serving. */
  def madBaseline(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    val base = df.select(col(keyCol),
      round(col(valueCol) * scale.toDouble, 0).cast("long").as("__qv"))
    val med = base
      .groupBy(col(keyCol))
      // 2·median of longs is an exact integer; track deviations in
      // doubled units so they stay longs and the MAD percentile is
      // exact too.
      .agg((expr("percentile(__qv, 0.5)") * 2.0).cast("long").as("med2"))
    base
      .join(med, Seq(keyCol))
      .withColumn("__dev2", abs(col("__qv") * 2L - col("med2")))
      .groupBy(col(keyCol), col("med2"))
      .agg(expr("percentile(__dev2, 0.5)").as("mad2"))
  }

  /** Score rows against a (possibly pre-computed) [[madBaseline]] —
    * the SERVING face: the baseline is a static key-sized relation, so
    * this is a stateless broadcast-join projection that runs unchanged
    * over a Structured Stream (batch ≡ stream pinned in
    * StreamingSpec) — fit the robust baseline on yesterday's batch,
    * flag today's telemetry as it arrives. */
  def madScore(
      df: DataFrame,
      baseline: DataFrame,
      keyCol: String,
      valueCol: String,
      threshold: Double = 3.5,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    df
      .withColumn("__qv",
        round(col(valueCol) * scale.toDouble, 0).cast("long"))
      .join(broadcast(baseline), Seq(keyCol))
      .withColumn("__dev2", abs(col("__qv") * 2L - col("med2")))
      .where(col("mad2") > 0.0 &&
        col("__dev2").cast("double") > lit(threshold) * col("mad2"))
      .withColumn("score",
        round(col("__dev2").cast("double") / col("mad2"), 6))
      .drop("__qv", "med2", "__dev2", "mad2")
  }

  /** Per-key daily trend: ordinary-least-squares slope / intercept /
    * r² of the quantized daily total against the day index, over the
    * DENSE day grid (a day with no events is a zero — a decaying
    * source shows decay, not a shorter series). The trend readout
    * that turns q75/q81's point anomalies into a direction.
    *
    * Exact integer moments (Σd, Σy, Σd², Σdy, Σy² — day indexes and
    * quantized totals are longs), one fixed-shape double evaluation
    * per key at the end (round 6); slope/intercept/r² are NULL on a
    * single-day range (zero variance in d). Scale shape: one
    * (key, day) tally, a literal-bounds grid fill, one key-keyed
    * moment aggregation — grid rows, never raw events, after the
    * first tally. */
  def dailyTrend(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val dc = events.select(
      col(keyCol).as("__k"),
      expr(s"unix_micros($tsCol) div 86400000000").as("__d"),
      col(valueCol).cast("long").as("__v"))
      .groupBy(col("__k"), col("__d")).agg(sum(col("__v")).as("__y"))
    val bounds = dc.agg(min(col("__d")).as("lo"), max(col("__d")).as("hi"))
      .collect()(0)
    if (bounds.isNullAt(0))
      return Seq.empty[(String, Long, Option[Double], Option[Double], Option[Double])]
        .toDF(keyCol, "n_days", "slope", "intercept", "r2")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val grid = dc.select(col("__k")).distinct()
      .select(col("__k"), explode(sequence(lit(0L), lit(hi - lo))).as("__i"))
      .join(dc.select(col("__k"), (col("__d") - lo).as("__i"), col("__y")),
        Seq("__k", "__i"), "left")
      .select(col("__k"), col("__i"), coalesce(col("__y"), lit(0L)).as("__y"))
    val m = grid.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"),
      sum(col("__i")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__i") * col("__i")).as("__sxx"),
      sum(col("__i") * col("__y")).as("__sxy"),
      sum(col("__y") * col("__y")).as("__syy"))
    val den = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val deny = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    val slope = num / den
    m.select(
      col("__k").as(keyCol),
      col("__n").as("n_days"),
      when(den > 0.0, round(slope, 6)).as("slope"),
      when(den > 0.0,
        round(col("__sy").cast("double") / col("__n").cast("double") -
          slope * (col("__sx").cast("double") / col("__n").cast("double")),
          6)).as("intercept"),
      when(den > 0.0 && deny > 0.0,
        round(num * num / (den * deny), 6)).as("r2"))
  }

  /** Integer EWMA spike detection over the dense hourly grid: per key,
    * hourly event counts smoothed by the exponential moving average
    * s_t = ((α⁻¹−1)·s_{t−1} + c_t·scale) div α⁻¹ (α = 1/`alphaDen`,
    * all operands non-negative longs — truncating and flooring integer
    * division agree, so every engine replays it bit-for-bit), and an
    * hour flagged when the raw count deviates from the PRIOR smoothed
    * level by more than `threshNum`/`threshDen` of it — the live
    * rate-anomaly complement to the level-based q75 MAD detector
    * (EWMA sees drift the global median forgives). Missing hours count
    * as ZERO — a silent scraper is exactly the anomaly to catch.
    *
    * Scale shape: one (key, hour)-keyed tally over the stream, a
    * literal-bounds hour grid (min/max epoch hour is one bounded
    * collect), and ONE key-keyed aggregation whose per-key state is
    * the key's own hour range — the sequential recurrence runs as a
    * scan-local HOF fold per key, embarrassingly parallel ACROSS keys
    * (time ranges bound the array, data volume never does). No window
    * over raw events, no driver iteration. */
  def ewmaSpikes(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      alphaDen: Long = 8L,
      threshNum: Long = 1L,
      threshDen: Long = 2L,
      scale: Long = 1000000L): DataFrame = {
    require(alphaDen >= 2 && threshNum >= 1 && threshDen >= 1 && scale >= 1,
      s"bad ewma params: alphaDen=$alphaDen thresh=$threshNum/$threshDen scale=$scale")
    val hc = events.select(
      col(keyCol).as("__k"),
      expr(s"unix_micros($tsCol) div 3600000000").as("__h"))
      .groupBy(col("__k"), col("__h")).agg(count(lit(1)).as("__c"))
    ewmaSpikesFromTallies(hc, "__k", "__h", "__c",
      alphaDen, threshNum, threshDen, scale)
      .withColumnRenamed("__k", keyCol)
  }

  /** [[ewmaSpikes]] starting from PRE-AGGREGATED (key, epoch-hour,
    * count) tallies — the entry point streaming partial tallies fold
    * into ([[graft.streaming.EventStreams.ewmaProgress]]); counts for
    * the same (key, hour) must already be summed. */
  def ewmaSpikesFromTallies(
      tallies: DataFrame,
      keyCol: String,
      hourCol: String,
      cntCol: String,
      alphaDen: Long = 8L,
      threshNum: Long = 1L,
      threshDen: Long = 2L,
      scale: Long = 1000000L): DataFrame = {
    require(alphaDen >= 2 && threshNum >= 1 && threshDen >= 1 && scale >= 1,
      s"bad ewma params: alphaDen=$alphaDen thresh=$threshNum/$threshDen scale=$scale")
    val spark = tallies.sparkSession
    import spark.implicits._
    val hc = tallies.select(col(keyCol).as("__k"),
      col(hourCol).cast("long").as("__h"), col(cntCol).cast("long").as("__c"))
    val bounds = hc.agg(min(col("__h")).as("lo"), max(col("__h")).as("hi"))
      .collect()(0)
    if (bounds.isNullAt(0))
      return Seq.empty[(String, Long, Long, Long, Boolean)]
        .toDF(keyCol, "hour_epoch_s", "cnt", "ewma_q", "spike")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val grid = hc.select(col("__k")).distinct()
      .select(col("__k"),
        explode(sequence(lit(0L), lit(hi - lo))).as("__i"))
      .join(hc.select(col("__k"), (col("__h") - lo).as("__i"), col("__c")),
        Seq("__k", "__i"), "left")
      .select(col("__k"), col("__i"), coalesce(col("__c"), lit(0L)).as("__c"))
    val stepped = grid
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(struct(col("__i"), col("__c")))).as("__a"))
      .select(col("__k"), explode(expr(
        s"""aggregate(
           |  __a,
           |  named_struct(
           |    's', cast(-1 as bigint),
           |    'o', cast(array() as
           |           array<struct<i:bigint,c:bigint,e:bigint,f:boolean>>)),
           |  (acc, x) -> named_struct(
           |    's', CASE WHEN acc.s < 0 THEN x.__c * ${scale}L
           |         ELSE (${alphaDen - 1}L * acc.s + x.__c * ${scale}L)
           |              div ${alphaDen}L END,
           |    'o', array_append(acc.o, named_struct(
           |      'i', x.__i,
           |      'c', x.__c,
           |      'e', CASE WHEN acc.s < 0 THEN x.__c * ${scale}L
           |           ELSE (${alphaDen - 1}L * acc.s + x.__c * ${scale}L)
           |                div ${alphaDen}L END,
           |      'f', acc.s >= 0 AND
           |        abs(x.__c * ${scale}L - acc.s) * ${threshDen}L
           |          > ${threshNum}L * acc.s))),
           |  acc -> acc.o)""".stripMargin)).as("__r"))
    stepped.select(
      col("__k").as(keyCol),
      ((col("__r.i") + lo) * 3600L).as("hour_epoch_s"),
      col("__r.c").as("cnt"),
      col("__r.e").as("ewma_q"),
      col("__r.f").as("spike"))
  }
}
