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

  test("funnelLags: exact transition lags, percentiles, unreached transitions absent") {
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 00:00:10"),
      (1L, "click", "2024-01-01 00:01:10"),
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "view", "2024-01-01 00:00:30"))
    val got = Funnel
      .funnelLags(df, "user_id", "event_type", "ts", steps)
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    // signup->view lags {10s, 30s}: mean 20, p50 interpolated 20, p90 28;
    // view->click only user 1 (60s); click->purchase reached by nobody
    assert(got == Seq(
      (2, "signup->view", 2L, 20.0, 20.0, 28.0),
      (3, "view->click", 1L, 60.0, 60.0, 60.0)))
    val again = Funnel
      .funnelLags(df.repartition(5), "user_id", "event_type", "ts", steps)
      .orderBy(col("step")).collect().map(_.toSeq).toSeq
    assert(again == Funnel.funnelLags(df, "user_id", "event_type", "ts", steps)
      .orderBy(col("step")).collect().map(_.toSeq).toSeq)
    intercept[IllegalArgumentException](
      Funnel.funnelLags(df, "user_id", "event_type", "ts", Seq("signup")))
  }

  test("linearAttribution: equal split, direct fallback, lookback + strict-order cutoffs, truncation exact") {
    val df = Seq(
      // user 1: 2 touches inside the window, purchase 10.01 -> each
      // channel gets floor(1001 * 1e6 / 2) micro-cents
      (1L, 1L, "view", "2024-01-01 00:00:00", 0.0),
      (1L, 2L, "click", "2024-01-01 01:00:00", 0.0),
      (1L, 3L, "purchase", "2024-01-01 02:00:00", 10.01),
      // user 2: touch AT the purchase instant doesn't count (strict <),
      // touch past the 48h lookback doesn't count -> direct
      (2L, 4L, "view", "2023-12-28 00:00:00", 0.0),
      (2L, 5L, "view", "2024-01-01 02:00:00", 0.0),
      (2L, 6L, "purchase", "2024-01-01 02:00:00", 5.0),
      // user 3: no touches at all -> direct
      (3L, 7L, "purchase", "2024-01-01 02:00:00", 1.0))
      .toDF("user_id", "event_id", "event_type", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    def run(d: org.apache.spark.sql.DataFrame) =
      Funnel.linearAttribution(d, "user_id", "event_type", "ts",
        "event_id", "value", Seq("view", "click"), "purchase", 48L)
        .orderBy(col("channel"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val half = 1001L * 1000000L / 2L
    assert(run(df) == Seq(
      ("click", 1L, 1L, half),
      ("direct", 2L, 0L, 600L * 1000000L),
      ("view", 1L, 1L, half)))
    assert(run(df.repartition(7)) == run(df))
    intercept[IllegalArgumentException](
      Funnel.linearAttribution(df, "user_id", "event_type", "ts",
        "event_id", "value", Seq("purchase"), "purchase", 48L))
  }

  test("linearAttribution: maxTouches keeps the k nearest-in-time touches per conversion") {
    // planted bot user: 12 views + 3 clicks inside the 48 h window, one
    // 1.00 purchase. With maxTouches = 5 the nearest-in-time survivors
    // are the 3 clicks (00:20-00:22) and the 2 latest views (00:10,
    // 00:11); shares split over the CAPPED count (5), so all value is
    // still attributed.
    val bot =
      (0 until 12).map(m => (9L, 100L + m, "view", f"2024-01-01 00:$m%02d:00", 0.0)) ++
      (0 until 3).map(m => (9L, 200L + m, "click", f"2024-01-01 00:2$m:00", 0.0)) :+
      ((9L, 300L, "purchase", "2024-01-01 01:00:00", 1.0))
    val df = bot.toDF("user_id", "event_id", "event_type", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    def run(d: org.apache.spark.sql.DataFrame, cap: Int) =
      Funnel.linearAttribution(d, "user_id", "event_type", "ts",
        "event_id", "value", Seq("view", "click"), "purchase", 48L,
        maxTouches = cap)
        .orderBy(col("channel"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val share = 100L * 1000000L / 5L
    assert(run(df, 5) == Seq(
      ("click", 1L, 3L, 3L * share),
      ("view", 1L, 2L, 2L * share)))
    // pair count is bounded by conversions x cap: total touches 5, not 15
    assert(run(df, 5).map(_._3).sum == 5L)
    // a generous cap keeps every touch (the uncapped readout)
    val unc = run(df, 100)
    assert(unc.map(_._3).sum == 15L)
    assert(unc.find(_._1 == "view").get._3 == 12L)
    // cap-stable under repartitioning
    assert(run(df.repartition(7), 5) == run(df, 5))
    intercept[IllegalArgumentException](run(df, 0))
    // plan shape: the bare rank filter must rewrite into WindowGroupLimit
    // (the partial mode caps pairs in the join's own task, ahead of the
    // per-conversion window exchange)
    val physical = Funnel.linearAttribution(df, "user_id", "event_type",
      "ts", "event_id", "value", Seq("view", "click"), "purchase", 48L,
      maxTouches = 5).queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"),
      s"rank-filter cap did not plan as WindowGroupLimit:\n$physical")
  }

  test("funnel: zero-collect construction, one action end-to-end") {
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (2L, "signup", "2024-01-01 00:30:00"))
    var plan: org.apache.spark.sql.DataFrame = null
    // construction must trigger NO driver action and NO stage: the step
    // tally derives in-plan (the former collect re-executed the whole
    // upstream once at construction and again at the main action)
    val (a0, s0) = countWork {
      plan = Funnel.funnel(df, "user_id", "event_type", "ts", steps)
    }
    assert(a0 == 0 && s0 == 0, s"construction ran work: actions=$a0 stages=$s0")
    val (a1, s1) = countWork { plan.collect(): Unit }
    assert(a1 == 1, s"readout should be ONE action, saw $a1")
    info(s"funnel readout stages: $s1")
    // the packed-tally readout consumes the per-user chain relation
    // exactly ONCE: the executed plan must contain a single user-keyed
    // exchange and no duplicate chain subtree (the pre-packed shape
    // had three logical copies that AQE had to dedupe at runtime;
    // this shape never creates them). Keep only the FINAL adaptive
    // plan (the rendering appends the pre-AQE "Initial Plan" section)
    // and count DISTINCT plan ids (reused stages print in full).
    val executed = plan.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def exchangeIds(keyFragment: String): Set[String] = executed.linesIterator
      .filter(l => l.contains(s"Exchange hashpartitioning($keyFragment") &&
        !l.contains("ReusedExchange"))
      .flatMap(l => "plan_id=(\\d+)".r.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    val userIds = exchangeIds("user_id")
    val stepIds = exchangeIds("__step")
    assert(userIds.size == 1 && stepIds.size == 1,
      s"chain must be consumed once: user exchanges=$userIds " +
        s"step exchanges=$stepIds")
  }

  test("chain state is row-bounded: no collect_list on the chain path; planted bot exact") {
    // ROUND 12: the chain derives via a window cascade with O(1) state
    // per row — the previous shape collect_list'ed EVERY matching event
    // per (user, step), so one bot user with 10^7 step events made a
    // multi-GB aggregation buffer row. Structural pin: the only
    // collect_list in funnel's plan is the steps-bounded packed tally;
    // userDepth/funnelLags plans carry NONE at all.
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"))
    def collects(plan: org.apache.spark.sql.DataFrame): Int =
      "collect_list".r
        .findAllIn(plan.queryExecution.optimizedPlan.toString).size
    assert(collects(Funnel.userDepth(df, "user_id", "event_type", "ts", steps)) == 0)
    assert(collects(Funnel.funnelLags(df, "user_id", "event_type", "ts", steps)) == 0)
    // funnel: exactly the tally pack (over a <=|steps|-row relation)
    assert(collects(Funnel.funnel(df, "user_id", "event_type", "ts", steps)) == 1)
    // planted bot: 20k step events on ONE user, interleaved so the
    // greedy chain is non-trivial — exact depth, same answer under
    // repartitioning (the bound is structural, this pins correctness
    // at adversarial per-key cardinality)
    val botRows = (0 until 20000).map { i =>
      val st = steps(i % 4)
      (7L, st, f"2024-01-${1 + i / 1440}%02d ${(i / 60) % 24}%02d:${i % 60}%02d:00")
    } :+ ((8L, "signup", "2024-01-01 00:00:00"))
    val bot = ev(botRows: _*)
    val got = Funnel.userDepth(bot, "user_id", "event_type", "ts", steps)
      .orderBy(col("user_id")).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // user 7 cycles signup->view->click->purchase from the very first
    // events: full depth. user 8 stops at signup.
    assert(got == Seq((7L, 4), (8L, 1)))
    assert(Funnel.userDepth(bot.repartition(13), "user_id", "event_type", "ts", steps)
      .orderBy(col("user_id")).collect().map(_.toSeq).toSeq ==
      Funnel.userDepth(bot, "user_id", "event_type", "ts", steps)
        .orderBy(col("user_id")).collect().map(_.toSeq).toSeq)
  }

  test("topPaths: sessions rank-cap to maxLen+1 before the collect; bot session exact") {
    // a never-idle bot session (5000 events, 1 min apart) must not grow
    // an unbounded aggregation row: the rank filter keeps maxLen+1 rows
    // per session ahead of the collect (WindowGroupLimit shape), and the
    // render still sees the right prefix + truncation marker
    val bot = (0 until 5000).map { i =>
      (1L, i.toLong, s"e${i % 3}",
        f"2024-01-${1 + i / 1440}%02d ${(i / 60) % 24}%02d:${i % 60}%02d:00")
    }
    val df = bot.toDF("user_id", "event_id", "event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Funnel.topPaths(df, "user_id", "event_type", "ts", "event_id", 6L, 3, 5)
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("e0>e1>e2>…", 1L)))
    // plan pin: the bare rank filter rewrites into WindowGroupLimit, so
    // at most maxLen+1 rows per session survive to the aggregation
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"),
      s"session cap did not plan as WindowGroupLimit:\n$physical")
  }

  test("userDepth: per-user reach agrees with the funnel tally") {
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (1L, "click", "2024-01-01 02:00:00"),
      (1L, "purchase", "2024-01-01 03:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-01 01:00:00"),
      (3L, "view", "2024-01-01 00:00:00"))
    val got = Funnel.userDepth(df, "user_id", "event_type", "ts", steps)
      .orderBy(col("user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .toSeq
    assert(got == Seq((1L, 4), (2L, 1), (3L, 0)))
    // tally consistency: #users with depth >= k equals funnel's step-k count
    val depths = got.map(_._2)
    val tally = run(df).map(_._3)
    assert(steps.indices.map(i => depths.count(_ >= i + 1).toLong) == tally)
    // repartition-stable
    assert(Funnel.userDepth(df.repartition(5), "user_id", "event_type", "ts", steps)
      .orderBy(col("user_id")).collect().map(_.toSeq).toSeq ==
      Funnel.userDepth(df, "user_id", "event_type", "ts", steps)
        .orderBy(col("user_id")).collect().map(_.toSeq).toSeq)
  }

  test("userDepthWithZeros: users with only non-step events reappear at depth 0") {
    // user 4's events are ALL non-step types: absent from userDepth
    // (the round-12 chain rewrite pre-filters to step-typed events),
    // restored at depth 0 by the withZeros variant (round 13, ADVICE)
    val df = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (4L, "scroll", "2024-01-01 00:00:00"),
      (4L, "hover", "2024-01-01 01:00:00"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("user_id")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val bare = rows(Funnel.userDepth(df, "user_id", "event_type", "ts", steps))
    val withZeros =
      rows(Funnel.userDepthWithZeros(df, "user_id", "event_type", "ts", steps))
    assert(bare == Seq((1L, 2), (2L, 0)))
    assert(withZeros == Seq((1L, 2), (2L, 0), (4L, 0)))
  }

  test("transitionMatrix: session cuts, start/end states, quantized rows sum to ~1") {
    val df = Seq(
      // user 1, session A: a -> b -> a; session B (7h later): b
      (1L, 10L, "a", "2024-01-01 00:00:00"),
      (1L, 11L, "b", "2024-01-01 01:00:00"),
      (1L, 12L, "a", "2024-01-01 02:00:00"),
      (1L, 13L, "b", "2024-01-01 09:30:00"),
      // user 2, one session: a -> b
      (2L, 14L, "a", "2024-01-01 00:00:00"),
      (2L, 15L, "b", "2024-01-01 00:30:00"))
      .toDF("user_id", "event_id", "event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    def run(d: org.apache.spark.sql.DataFrame) =
      Funnel.transitionMatrix(d, "user_id", "event_type", "ts", "event_id", 6L)
        .orderBy(col("from_state"), col("to_state"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    // u1 session A = a,b,a -> (a>b, b>a, a>__end); u1 session B (7.5 h
    // silence) = b -> (b>__end); u2 = a,b -> (a>b, b>__end); starts:
    // a (sA), b (sB), a (u2). From 'a': b x2, __end x1; from 'b':
    // __end x2, a x1.
    assert(run(df) == Seq(
      ("__start", "a", 2L, 666666L),
      ("__start", "b", 1L, 333333L),
      ("a", "__end", 1L, 333333L),
      ("a", "b", 2L, 666666L),
      ("b", "__end", 2L, 666666L),
      ("b", "a", 1L, 333333L)))
    assert(run(df.repartition(5)) == run(df))
    // each from-row's probabilities sum to scale within truncation slack
    run(df).groupBy(_._1).foreach { case (_, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
  }

  test("topPaths: render, truncation marker, deterministic top-k boundary") {
    val mk = (u: Long, id: Long, e: String, ts: String) => (u, id, e, ts)
    val rows = Seq(
      mk(1L, 1L, "a", "2024-01-01 00:00:00"),
      mk(1L, 2L, "b", "2024-01-01 00:10:00"),
      mk(2L, 3L, "a", "2024-01-01 00:00:00"),
      mk(2L, 4L, "b", "2024-01-01 00:10:00"),
      // user 3: six events -> truncates at 5 with the marker
      mk(3L, 5L, "a", "2024-01-01 00:00:00"),
      mk(3L, 6L, "b", "2024-01-01 00:01:00"),
      mk(3L, 7L, "c", "2024-01-01 00:02:00"),
      mk(3L, 8L, "d", "2024-01-01 00:03:00"),
      mk(3L, 9L, "e", "2024-01-01 00:04:00"),
      mk(3L, 10L, "f", "2024-01-01 00:05:00"),
      // user 4: single event
      mk(4L, 11L, "c", "2024-01-01 00:00:00"))
    val df = rows.toDF("user_id", "event_id", "event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      Funnel.topPaths(d, "user_id", "event_type", "ts", "event_id", 6L, 5, k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(df, 10) == Seq(
      ("a>b", 2L), ("a>b>c>d>e>…", 1L), ("c", 1L)))
    // ties at the k boundary break path-asc
    assert(run(df, 2) == Seq(("a>b", 2L), ("a>b>c>d>e>…", 1L)))
    assert(run(df.repartition(7), 10) == run(df, 10))
  }

  test("bad params rejected") {
    val df = ev((1L, "signup", "2024-01-01 00:00:00"))
    intercept[IllegalArgumentException](
      Funnel.funnel(df, "user_id", "event_type", "ts", Seq.empty))
    intercept[IllegalArgumentException](
      Funnel.funnel(df, "user_id", "event_type", "ts", Seq("a", "a")))
  }
}
