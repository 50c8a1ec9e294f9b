package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the product-analytics
  * readout (signup → view → click → purchase) the reference's fold
  * surface computes per column but never per ordered SEQUENCE
  * (reference `src/Frames/Folds.hs` builds per-column folds; a funnel
  * is a per-entity ORDER-sensitive fold).
  *
  * Semantics: a user reaches step k when some step-k event strictly
  * follows their step-(k−1) reach time, greedily matched — step 1 is
  * the user's earliest step-1 event, step k the earliest step-k event
  * after the step-(k−1) match (the standard strict-order funnel;
  * same-timestamp events do NOT chain).
  *
  * Scale shape: ONE user-partitioned window cascade derives the chain
  * with O(|steps|) state per ROW and zero per-user arrays (round 12 —
  * the previous collect_list shape buffered every matching event per
  * (user, step), so one bot user with 10⁷ step events made a multi-GB
  * aggregation row; the window sort is spillable and its running-min
  * frames carry constant state). Only step-typed events reach the
  * exchange; the per-user collapse after the cascade is a |steps|-min
  * aggregation that reuses the window's partitioning (no second
  * shuffle). The step tally then derives IN-PLAN via steps-bounded
  * broadcast joins against a |steps|-row dimension — the whole readout
  * is one action, zero-collect, no driver state at all. */
object Funnel {

  /** (step, event_type, users, conv_prev, conv_first) — one row per
    * funnel step, zero-reach steps kept. Timestamps compare at
    * microsecond precision; `conv_prev` is NULL for step 1 and for
    * steps whose predecessor had zero users. */
  /** Per-user greedy chain times: one row per user with `__t0..__tn`
    * match timestamps (micros; null from the first unreached step on).
    * Shared by [[funnel]] and [[funnelLags]].
    *
    * Derivation (round 12 — O(1) state per row, no per-key arrays):
    * per event row at time t, step k is a CANDIDATE when the running
    * min of step-(k−1) candidates over STRICTLY-EARLIER rows is < t —
    * equivalent to the greedy `__t(k−1) < t` because candidate values
    * are their own row times (the minimal step-(k−1) candidate, if
    * < t, lies inside the strictly-before range frame). `__tk` is then
    * the per-user min of step-k candidates. The range frame (not rows)
    * keeps same-timestamp events from chaining, and the |steps|
    * cascaded window columns share one (user)-partitioned sort —
    * exactly one exchange, which the final min-aggregation reuses. */
  private def chainTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    // only step-typed events reach the exchange — a user whose events
    // are all non-step types contributes no chain either way (funnel /
    // userDepth consumers gate on depth >= 1)
    val typed = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol).as("__e"),
        unix_micros(col(tsCol)).as("__t"))
    val wPrev = Window.partitionBy(col(userCol)).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val cascaded = steps.indices.foldLeft(typed) { (df, i) =>
      val cand =
        if (i == 0) when(col("__e") === steps(0), col("__t"))
        else when(col("__e") === steps(i) &&
          min(col(s"__c${i - 1}")).over(wPrev) < col("__t"), col("__t"))
      df.withColumn(s"__c$i", cand)
    }
    val mins = steps.indices.map(i => min(col(s"__c$i")).as(s"__t$i"))
    // grouping by the window's own partition key — the exchange is reused
    cascaded.groupBy(col(userCol).as("__u")).agg(mins.head, mins.tail: _*)
  }

  /** reach is monotone (__tk nonnull implies __t(k-1) nonnull), so the
    * DEEPEST check must sit outermost: fold ascending, each step wrapping
    * the shallower cases */
  private def depthExpr(steps: Seq[String]) =
    steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"__t$i").isNotNull, lit(i + 1)).otherwise(acc)
    }

  /** Per-user funnel reach: one row per user with the deepest step index
    * (1-based; 0 = no step-1 event) under the same greedy strict-order
    * chain as [[funnel]]. The composable face — [[funnel]] is this
    * collapsed to step tallies, and a pipeline that needs to GATE on
    * funnel progress (p36: attribution and experiment readout over
    * users who reached "click") joins against this instead of
    * re-deriving the chain. Same scale shape as [[funnel]]: one
    * user-partitioned exchange, O(1) state per row. Users with no event
    * of ANY step type are absent (they would read depth 0; every
    * consumer gates on depth >= 1, and excluding them keeps the shuffle
    * proportional to step-typed events, not the stream). */
  def userDepth(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame =
    chainTimes(events, userCol, typeCol, tsCol, steps)
      .select(col("__u").as(userCol), depthExpr(steps).cast("int").as("depth"))

  /** [[userDepth]] for callers that counted depth-0 users: the round-12
    * chain rewrite pre-filters to step-typed events, so users whose
    * events are ALL non-step types dropped out of [[userDepth]]'s
    * row-set (they used to appear with depth 0). This variant restores
    * them by left-joining the distinct user universe back in — an extra
    * user-keyed distinct + join, so it only pays when the zero-depth
    * rows are actually consumed. */
  def userDepthWithZeros(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    val reached = userDepth(events, userCol, typeCol, tsCol, steps)
    events.filter(col(userCol).isNotNull).select(col(userCol)).distinct()
      .join(reached, Seq(userCol), "left")
      .select(col(userCol), coalesce(col("depth"), lit(0)).as("depth"))
  }

  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val chained = chainTimes(events, userCol, typeCol, tsCol, steps)
    val depth = depthExpr(steps)
    // the step tally derives IN-PLAN (the p36 pattern): the former
    // construction-time collect — bounded at ≤|steps| rows but a
    // SEPARATE driver action — re-executed the whole upstream before
    // the main action ran it again. The tally aggregation joins a
    // |steps|-row step dimension (left, so zero-reach steps survive),
    // then the whole ≤|steps|-row readout PACKS into one sorted struct
    // array (a single-row aggregate of a steps-bounded relation) so the
    // prev/first conversion denominators are scan-local array lookups —
    // the per-user chain relation is consumed exactly ONCE, with no
    // self-joins that would re-read the chain exchange per denominator.
    // One action, zero-collect.
    val tally = chained
      .select(depth.cast("int").as("__depth"))
      .filter(col("__depth") >= 1)
      .select(explode(sequence(lit(1), col("__depth"))).as("__step"))
      .groupBy(col("__step")).agg(count(lit(1)).as("__users"))
    val stepDim = steps.zipWithIndex
      .map { case (st, i) => (i + 1, st) }
      .toDF("step", "event_type")
    val counts = stepDim
      .join(tally, stepDim("step") === tally("__step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("__users"), lit(0L)).as("users"))
    // steps are dense 1..n (stepDim guarantees every step one row), so
    // after the sort element i of the packed array IS step i (1-based)
    val packed = counts.agg(sort_array(collect_list(
      struct(col("step"), col("event_type"), col("users")))).as("__all"))
    packed
      .select(explode(col("__all")).as("__s"), col("__all"))
      .select(
        col("__s.step").as("step"),
        col("__s.event_type").as("event_type"),
        col("__s.users").as("users"),
        round(col("__s.users").cast("double") /
          nullif(
            when(col("__s.step") > 1,
              element_at(col("__all"), col("__s.step") - 1)
                .getField("users")).cast("double"),
            lit(0.0)), 6).as("conv_prev"),
        round(col("__s.users").cast("double") /
          nullif(element_at(col("__all"), lit(1))
            .getField("users").cast("double"), lit(0.0)), 6).as("conv_first"))
  }

  /** Time-to-convert per funnel transition: for each adjacent step
    * pair, how long the users who made it took — count, mean, median
    * and p90 lag in seconds (exact interpolated percentiles over the
    * matched-time differences). Slow transitions localize WHERE a
    * funnel leaks even when the q79 conversion counts look healthy.
    *
    * Same single user-keyed aggregation as [[funnel]] (the chain is
    * shared); per-user lags explode scan-locally into ≤|steps|−1 rows
    * and the quantiles aggregate per TRANSITION — |steps|-bounded
    * groups, never a global sort. Transitions nobody completed are
    * absent (there is no lag distribution to describe). */
  def funnelLags(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "funnelLags needs at least two steps")
    val chained = chainTimes(events, userCol, typeCol, tsCol, steps)
    val lagStructs = (1 until steps.size).map { i =>
      struct(
        lit(i + 1).as("step"),
        lit(s"${steps(i - 1)}->${steps(i)}").as("transition"),
        (col(s"__t$i") - col(s"__t${i - 1}")).as("lag"))
    }
    chained
      .select(explode(array(lagStructs: _*)).as("__l"))
      .select(col("__l.step").as("step"),
        col("__l.transition").as("transition"),
        col("__l.lag").as("__lag"))
      .filter(col("__lag").isNotNull)
      .groupBy(col("step"), col("transition"))
      .agg(
        count(lit(1)).as("users"),
        round(avg(col("__lag")) / 1000000.0, 6).as("avg_lag_s"),
        round(expr("percentile(__lag, 0.5)") / 1000000.0, 6).as("p50_lag_s"),
        round(expr("percentile(__lag, 0.9)") / 1000000.0, 6).as("p90_lag_s"))
  }

  /** Session-scoped Markov transition matrix — the flow-analysis
    * readout next to [[funnel]] (fixed ordered steps) and
    * [[linearAttribution]] (credit assignment): for every ordered pair
    * of event types, how often one follows the other within a session,
    * with virtual `__start`/`__end` states so session entry and exit
    * distributions fall out of the same table (rows with from=`__start`
    * are the landing distribution; to=`__end` the drop-off points — a
    * proper absorbing-chain row-stochastic matrix per `from`).
    *
    * Sessions are gap-based (an inter-event silence ≥ `gapHours`
    * cuts); within a session events order by (time, `idCol`) so
    * same-timestamp events sequence deterministically. Probabilities
    * are quantized: p_q = count×scale div row_total — exact integer
    * division, bit-replayable by the oracle.
    *
    * Scale shape: ONE user-partitioned window pass (the lag-gap flag +
    * running session id + the within-session lead — all partitioned by
    * user, PlanAudit-safe), one (from, to) keyed long aggregation
    * (map-side partials), and the row totals join back over ≤|types|+1
    * keys — a broadcast join against a types-bounded relation, never a
    * second pass over events. */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      gapHours: Long,
      scale: Long = 1000000L): DataFrame = {
    require(gapHours >= 1 && scale > 0,
      s"bad transition params: gapHours=$gapHours scale=$scale")
    val gapUs = gapHours * 3600L * 1000000L
    val base = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__e"),
        unix_micros(col(tsCol)).as("__t"), col(idCol).as("__id"))
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__id"))
    val sessioned = base
      .withColumn("__new",
        when(lag(col("__t"), 1).over(w).isNull ||
          col("__t") - lag(col("__t"), 1).over(w) >= gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("__u"), col("__sid"))
      .orderBy(col("__t"), col("__id"))
    val steps = sessioned
      .withColumn("__next", lead(col("__e"), 1).over(ws))
      .withColumn("__first", row_number().over(ws) === 1)
    // each event row yields its (e -> next|__end) transition; session
    // heads additionally yield the (__start -> e) entry transition.
    // Emitted as ONE scan-local explode, NOT a union of two selects
    // over `steps` — sibling union branches do not share the
    // pre-exchange window pass, so the union shape sessionizes the
    // stream twice (the g14/q79 lesson).
    val fwd = struct(col("__e").as("from_state"),
      coalesce(col("__next"), lit("__end")).as("to_state"))
    val entry = struct(lit("__start").as("from_state"),
      col("__e").as("to_state"))
    val trans = steps
      .select(explode(
        when(col("__first"), array(fwd, entry)).otherwise(array(fwd)))
        .as("__tr"))
      .select(col("__tr.from_state"), col("__tr.to_state"))
    val counts = trans
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts
      .groupBy(col("from_state"))
      .agg(sum(col("n")).as("__tot"))
    counts
      .join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        expr(s"n * ${scale}L div __tot").as("p_q"))
  }

  /** Top session paths — the "most common user journeys" readout over
    * the same gap sessions as [[transitionMatrix]]: each session
    * renders its first `maxLen` event types as one `a>b>c` string
    * (longer sessions truncate with `>…` so the path alphabet stays
    * bounded), and the most frequent paths win. Count-desc, path-asc
    * deterministic ordering.
    *
    * Scale shape: the same single user-partitioned window pass; each
    * session is rank-filtered to its first `maxLen`+1 events INSIDE
    * that pass (round 12 — the rank runs in the window's own stage and
    * only the retained rows reach the aggregation, so the collected
    * array is ≤ maxLen+1 structs per session — a never-idle bot
    * session can no longer grow an unbounded aggregation row; the +1
    * event carries the truncation evidence), then one (user, session)-
    * keyed aggregation (reusing the window's user partitioning — no
    * second exchange), a scan-local render, and a path-keyed count;
    * the top-k is a TakeOrderedAndProject, never a global sort. */
  def topPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      gapHours: Long,
      maxLen: Int,
      k: Int): DataFrame = {
    require(gapHours >= 1 && maxLen >= 1 && k >= 1,
      s"bad path params: gapHours=$gapHours maxLen=$maxLen k=$k")
    val gapUs = gapHours * 3600L * 1000000L
    val base = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__e"),
        unix_micros(col(tsCol)).as("__t"), col(idCol).as("__id"))
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__id"))
    val sessioned = base
      .withColumn("__new",
        when(lag(col("__t"), 1).over(w).isNull ||
          col("__t") - lag(col("__t"), 1).over(w) >= gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // cap BEFORE the collect: rank within the session (same ordering as
    // the render sort) and keep maxLen+1 rows — enough to render the
    // first maxLen events plus detect truncation. Bare rank filter =
    // the WindowGroupLimit shape; the (u, sid) window reuses the u
    // exchange (hash(u) clusters (u, sid)).
    val wSess = Window.partitionBy(col("__u"), col("__sid"))
      .orderBy(col("__t"), col("__id"))
    val rendered = sessioned
      .withColumn("__rn", row_number().over(wSess))
      .filter(col("__rn") <= maxLen + 1)
      .groupBy(col("__u"), col("__sid"))
      .agg(sort_array(collect_list(
        struct(col("__t"), col("__id"), col("__e")))).as("__evs"))
      .select(
        concat(
          array_join(slice(col("__evs.__e"), 1, maxLen), ">"),
          when(size(col("__evs")) > maxLen, lit(">…")).otherwise(lit("")))
          .as("path"))
    rendered
      .groupBy(col("path"))
      .agg(count(lit(1)).as("sessions"))
      .orderBy(col("sessions").desc, col("path").asc)
      .limit(k)
  }

  /** Linear multi-touch attribution: each conversion's value splits
    * EQUALLY across the same user's touch events inside the lookback
    * window (strictly before the conversion, within `lookback`);
    * conversions with no qualifying touch credit the synthetic
    * `direct` channel — the marketing-analytics readout between
    * last-touch (one winner) and data-driven (a model).
    *
    * Integer-exact: conversion value quantizes to cents upstream,
    * each touch gets `cents·10⁶ div touches` micro-cents (truncation
    * applied identically in the oracle), so shares are deterministic
    * at any partitioning. Output per channel: conversions touched,
    * raw touch count, and the attributed micro-cent total.
    *
    * Each conversion credits at most `maxTouches` touches — the k
    * NEAREST-in-time (most recent first; ties break channel-ascending,
    * and same-(time, channel) touches are interchangeable, so the
    * readout is deterministic). The cap is the `sessionCooccurrenceEdges
    * maxPerSession` skew discipline: without it one bot user with 10⁴
    * in-window touches and 10³ conversions makes a single user key a
    * ~10⁷-row straggler at scale, and attributing a conversion across
    * thousands of micro-shares is analytically meaningless anyway. The
    * default is generous — organic users never hit it.
    *
    * Scale shape: ONE user-keyed join of conversions onto touches —
    * bounded per user by that user's own conversions × touches inside
    * the lookback; the nearest-k rank-filter plans as a
    * WindowGroupLimit (a partial per-conversion top-k cap runs in the
    * join's own task, so at most k rows per conversion reach the
    * window exchange); the per-conversion touch count is a
    * conversion-partitioned window on the capped pairs (no second
    * join), and the channel rollup is a ≤|channels|+1 aggregation. */
  def linearAttribution(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      touchTypes: Seq[String],
      conversionType: String,
      lookbackHours: Long,
      maxTouches: Int = 100): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touch types $touchTypes must be non-empty and exclude $conversionType")
    require(lookbackHours >= 1, s"lookbackHours must be >= 1, got $lookbackHours")
    require(maxTouches >= 1, s"maxTouches must be >= 1, got $maxTouches")
    val lookUs = lookbackHours * 3600L * 1000000L
    val conv = events
      .filter(col(typeCol) === conversionType && col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(idCol).as("__pid"),
        unix_micros(col(tsCol)).as("__pt"),
        round(col(valueCol) * 100.0, 0).cast("long").as("__cents"))
    val touch = events
      .filter(col(typeCol).isin(touchTypes: _*) && col(userCol).isNotNull)
      .select(col(userCol).as("__u2"), col(typeCol).as("__ch"),
        unix_micros(col(tsCol)).as("__tt"))
    val w = Window.partitionBy(col("__pid"))
    // nearest-k per conversion: most recent touch first, channel breaks
    // time ties. A bare `row_number <= k` filter (no disjunction) is the
    // shape Catalyst's InferWindowGroupLimit rewrites into a partial
    // WindowGroupLimit ahead of the __pid exchange; a touchless
    // conversion is a singleton (null-channel) partition with rn = 1,
    // so it passes the filter and still credits `direct`.
    val wNear = Window.partitionBy(col("__pid"))
      .orderBy(col("__tt").desc, col("__ch").asc)
    conv
      .join(touch,
        col("__u") === col("__u2") &&
          col("__tt") < col("__pt") &&
          col("__tt") >= col("__pt") - lookUs,
        "left")
      .withColumn("__rn", row_number().over(wNear))
      .filter(col("__rn") <= maxTouches)
      .withColumn("__tc", count(col("__ch")).over(w))
      .select(
        coalesce(col("__ch"), lit("direct")).as("channel"),
        col("__pid"),
        col("__ch").isNotNull.as("__touched"),
        expr("__cents * 1000000L div greatest(__tc, 1L)").as("__amc"))
      .groupBy(col("channel"))
      .agg(
        count_distinct(col("__pid")).as("conversions"),
        sum(when(col("__touched"), 1L).otherwise(0L)).as("touches"),
        sum(col("__amc")).as("attributed_microcents"))
  }
}
