package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fold-surface parity helpers. The reference has no grouped aggregation
  * operator — aggregation is composable `Control.Foldl.Fold`s applied over
  * a stream or Frame (SURVEY §2.4; e.g. `test/UncurryFold.hs:18-20`
  * `avg = (/) <$> L.sum <*> L.genericLength`). Spark's `agg(a, b, c)` is
  * the idiomatic mapping: Catalyst fuses every aggregate in one pass,
  * exactly like the reference's applicative fold composition
  * (`benchmarks/BenchDemo.hs:28-31`), and additionally map-side-combines
  * before the shuffle.
  */
object Aggregates {

  /** Exact decimal-accumulated sum surfaced as double. Used wherever the
    * result must be independent of partition/summation order (double
    * addition is not associative; decimal addition is). The cast keeps the
    * user-facing schema simple.
    *
    * Input precision 18: per-row values stay in Spark Decimal's compact
    * long representation (precision <= 18), avoiding the BigDecimal slow
    * path on the hot per-row cast; the SUM accumulator is widened by
    * Catalyst to precision 28 regardless, so group sums stay exact up to
    * 10^28 — comfortably past 100 TB row counts. */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, scale))).cast("double")

  /** Money-sum of an exact decimal expression: decimal-domain sum
    * (order-independent), HALF_UP round to cents, then double. The input
    * must already be decimal-typed (cast each 2-decimal COLUMN to decimal
    * and multiply in the decimal domain): feeding a double product through
    * `sumExact` instead is engine-divergent at rounding boundaries — Spark
    * casts double->decimal via the value's shortest decimal representation
    * while DuckDB uses the exact binary value, so at ~6M rows a handful of
    * per-row casts round differently (found by the round-15 sf1 sweep on
    * q01's `sum_charge`). Rounding the sum to cents keeps the double output
    * exactly convertible in both engines (sum*100 stays under 2^53 up to
    * ~SF 2500); a scale-6 double output already could not carry the
    * micro-dollar digits at sf1 magnitudes (17 significant digits). */
  def sumExactCents(c: Column, inScale: Int = 6): Column =
    round(sum(c.cast(org.apache.spark.sql.types.DecimalType(18, inScale))), 2)
      .cast("double")

  /** Order-independent average: exact decimal sum / count. */
  def avgExact(c: Column, scale: Int = 2, roundTo: Int = 6): Column =
    round(sumExact(c, scale) / count(lit(1)), roundTo)

  /** min & max of a column in one fused pass (`demo/Tutorial.hs:160-166`
    * minMax applicative fold). */
  def minMax(df: DataFrame, c: String): DataFrame =
    df.agg(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))

  /** Row achieving the maximum of `ord` (the reference's
    * `F.maximumBy (comparing f)`, `demo/Kata04.hs:21-27`) — one row per
    * group, deterministic via the `tiebreak` column. Implemented as a
    * windowed row_number rather than `max_by` so ties resolve
    * deterministically across engines. */
  def argmax(
      df: DataFrame,
      groupCols: Seq[String],
      ord: Column,
      tiebreak: Column): DataFrame = {
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(ord.desc, tiebreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Multi-aggregate single pass over the whole table — the benchdemo
    * shape (`benchmarks/BenchDemo.hs:22-31`: two means in one traversal). */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        avgExact(col(c)).as(s"avg_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  private implicit val mgBufEnc
      : org.apache.spark.sql.Encoder[(Map[Long, Long], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Map[Long, Long], Long)]()
  private implicit val mgOutEnc
      : org.apache.spark.sql.Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Seq[Long], Long)]()

  /** Mergeable Misra–Gries candidate summary: `capacity` counters;
    * reduce decrements all on overflow, merge sums then subtracts the
    * (capacity+1)-th largest (Agarwal et al. 2012, "Mergeable
    * summaries"), preserving the invariant
    *   mgCount(key) ≥ trueCount(key) − N/(capacity+1),
    * so every key with trueCount > N/(capacity+1) SURVIVES regardless
    * of partitioning or merge order. */
  private def misraGries(capacity: Int)
      : org.apache.spark.sql.TypedColumn[Long, (Seq[Long], Long)] =
    new org.apache.spark.sql.expressions
      .Aggregator[Long, (Map[Long, Long], Long), (Seq[Long], Long)] {
      def zero: (Map[Long, Long], Long) = (Map.empty, 0L)
      def reduce(b: (Map[Long, Long], Long), k: Long): (Map[Long, Long], Long) = {
        val m = b._1
        val m2 =
          if (m.contains(k)) m.updated(k, m(k) + 1L)
          else if (m.size < capacity) m.updated(k, 1L)
          else m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        (m2, b._2 + 1L)
      }
      def merge(l: (Map[Long, Long], Long), r: (Map[Long, Long], Long))
          : (Map[Long, Long], Long) = {
        val s = r._1.foldLeft(l._1) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v)
        }
        val pruned =
          if (s.size <= capacity) s
          else {
            val cut = s.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
            s.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
          }
        (pruned, l._2 + r._2)
      }
      def finish(b: (Map[Long, Long], Long)): (Seq[Long], Long) =
        (b._1.keys.toSeq.sorted, b._2)
      def bufferEncoder: org.apache.spark.sql.Encoder[(Map[Long, Long], Long)] =
        mgBufEnc
      def outputEncoder: org.apache.spark.sql.Encoder[(Seq[Long], Long)] =
        mgOutEnc
    }.toColumn

  /** EXACT top-k heavy hitters WITHOUT a full-key-space aggregation —
    * the sketch-guided-pruning pattern (q55's Bloom join, applied to
    * aggregation): phase 1 runs a mergeable Misra–Gries summary
    * ([[misraGries]]) over the scan — fixed `capacity` counters per
    * task, only counter maps shuffle — and phase 2 computes exact
    * counts ONLY for the surviving candidate keys (a broadcast
    * LEFT SEMI prune before the aggregation shuffle, which then moves
    * candidate keys instead of the full key space).
    *
    * The result is EXACT and partitioning-independent whenever the
    * k-th heavy hitter clears the summary's worst-case bound, and the
    * operator PROVES it per run: `certified` = (k rows returned) AND
    * min(returned count)·(capacity+1) > N — pure integer arithmetic on
    * exact phase-2 counts, so the flag itself is deterministic. On a
    * miss, grow `capacity` (state is 16·capacity bytes per task) —
    * the honest contract, same shape as g08's `converged`.
    *
    * At 100 TB: the full groupBy this replaces shuffles every distinct
    * key (URLs, ngrams — billions); this shuffles `capacity`-bounded
    * maps plus one exact pass over candidate-key rows only. The O(m)
    * decrement on counter overflow amortizes to O(1)/row with the
    * offset-counter refinement if profiling ever demands it. */
  def exactHeavyHitters(
      df: DataFrame,
      keyCol: String,
      k: Int,
      capacity: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(capacity > k, s"capacity must exceed k, got $capacity <= $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("long").as("__k"))
      .filter(col("__k").isNotNull)
    val phase1 = keys.as[Long]
      .select(misraGries(capacity))
      .toDF("__cand", "__n")
    val cand = phase1.select(explode(col("__cand")).as("__k"))
    val n = phase1.select(col("__n"))
    val exact = keys
      .join(broadcast(cand), Seq("__k"), "left_semi")
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("__k").asc)
      .limit(k)
    val cert = exact
      .agg(count(lit(1)).as("__rows"), min(col("cnt")).as("__minc"))
      .crossJoin(broadcast(n))
      .select((col("__rows") === k &&
        col("__minc") * (capacity + 1).toLong > col("__n")).as("certified"))
    exact
      .crossJoin(broadcast(cert))
      // the rank window holds ≤ k rows by construction (post-limit);
      // the constant `certified` partition key keeps the plan inside
      // the partitioned-window contract the PlanAudit gate enforces
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("certified"))
          .orderBy(col("cnt").desc, col("__k").asc)))
      .select(col("__k").as(keyCol), col("cnt"), col("rank"), col("certified"))
  }

  /** Pairwise association rules (Agrawal & Srikant 1994, the level-2
    * Apriori pass): for item pairs co-occurring in ≥ `minSupport`
    * baskets — support, both directional confidences, and lift
    * (lift > 1 = genuinely associated, not just popular). The
    * market-basket readout raw co-occurrence counts (g09) stop short
    * of: a pair can co-occur often purely because both items are
    * everywhere; lift divides that away.
    *
    * Scale shape: baskets collapse to distinct (basket, item) rows;
    * the per-basket pair fanout is capped at `maxPerBasket` lowest
    * item ids (the g09 skew discipline — a mega-basket would
    * otherwise explode quadratically); item supports join back onto
    * the SURVIVING pairs only (AQE broadcasts the item side); the
    * basket total is a broadcast single-row aggregate crossJoined into
    * the plan — no driver-side action. Exact
    * integer counts, fixed-shape ratio doubles, round(6). Heads by
    * (lift desc, pair) plan as TakeOrderedAndProject. */
  def associationRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxPerBasket: Int,
      topK: Int): DataFrame = {
    require(minSupport >= 1 && maxPerBasket >= 2 && topK >= 1,
      s"bad rule params: minSupport=$minSupport cap=$maxPerBasket topK=$topK")
    val spark = baskets.sparkSession
    val bi = baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).cast("long").as("__i"))
      .distinct()
    val capped = bi
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__b")).orderBy(col("__i").asc)))
      .filter(col("__rn") <= maxPerBasket)
      .select(col("__b"), col("__i"))
    // basket count folded INTO the plan as a broadcast single-row
    // crossJoin (round 15 — the HITS-normalizer treatment this codebase
    // uses everywhere): the old driver-side `.distinct().count()` was an
    // extra action that re-executed the scan+distinct+window subtree
    // before the real query even started
    val nBaskets = capped.agg(countDistinct(col("__b")).as("__nb"))
    val items = capped.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = capped.select(col("__b"), col("__i").as("item_a"))
      .join(capped.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_baskets"))
      .filter(col("pair_baskets") >= minSupport)
    pairs
      .join(items.select(col("__i").as("item_a"), col("__n").as("__na")),
        Seq("item_a"))
      .join(items.select(col("__i").as("item_b"), col("__n").as("__nbi")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_baskets"),
        round(col("pair_baskets").cast("double") / col("__nb").cast("double"),
          6).as("support"),
        round(col("pair_baskets").cast("double") / col("__na").cast("double"),
          6).as("conf_a_to_b"),
        round(col("pair_baskets").cast("double") / col("__nbi").cast("double"),
          6).as("conf_b_to_a"),
        round(col("pair_baskets").cast("double") * col("__nb").cast("double")
          / (col("__na").cast("double") * col("__nbi").cast("double")),
          6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Pareto concentration readout (the 80/20 diagnostic): keys ranked
    * by descending total weight, cut into `buckets` equal-population
    * tiers, each tier reporting its key count, weight mass, and the
    * CUMULATIVE share of total weight through that tier — "the top 10%
    * of customers carry X% of revenue", or domains vs corpus tokens
    * when pointed at a crawl. Weights must be non-negative longs
    * (quantize upstream).
    *
    * Scale shape: one keyed tally, then the global descending rank and
    * running sum come from the custom [[graft.plans.PrefixSumExec]]
    * (range-partitioned parallel sort + per-partition offsets) — NEVER
    * a single-task `row_number()/sum() OVER (ORDER BY …)` window. Key
    * count and weight total are one bounded collect (a single row)
    * feeding the tier cut as literals; the tier rollup is a ≤`buckets`
    * aggregation. Ties break on the key for a total order. */
  /** RFM segmentation (Hughes 1994) — the customer-value companion of
    * [[paretoConcentration]]: every user scored 1–5 on Recency (days
    * since last event, fewer = better), Frequency (event count) and
    * Monetary (summed quantized cents), each score an exact RANK
    * quintile (score 5 = the best ~20%), plus the concatenated `rfm`
    * segment label ("555" = best-everything) marketing pipelines key
    * campaigns on.
    *
    * Determinism: quintiles are global ranks with an id tiebreak — a
    * pure function of the data, bit-replayable by the oracle
    * (`5 − rank×5 div n`, truncating division on non-negatives) — and
    * recency measures against the corpus max timestamp (plan-folded as
    * a broadcast single-row crossJoin), not wall clock, so reruns
    * agree. Input events are pre-filtered/quantized by the caller (the
    * [[Experiments.welchAbTest]] contract).
    *
    * Scale shape: one user-keyed aggregation collapses events, then the
    * THREE global ranks ride chained [[graft.Frame.withPrefixSum]]
    * range sorts over the user relation (parallel range partitioning —
    * never a single-task unpartitioned window); the user count lands on
    * the driver once (one long, the pareto precedent). */
  def rfmSegments(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      centsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = events
      .groupBy(col(userCol).as("__u"))
      .agg(
        max(unix_micros(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(centsCol).cast("long")).as("monetary_cents"))
    val n = perUser.count()
    if (n == 0L)
      return Seq.empty[(Long, Long, Long, Long, Int, Int, Int, String)]
        .toDF(userCol, "r_days", "frequency", "monetary_cents",
          "r_score", "f_score", "m_score", "segment")
    val base = perUser
      .crossJoin(broadcast(perUser.agg(max(col("__last")).as("__gmax"))))
      .select(col("__u"),
        expr("(__gmax - __last) div 86400000000L").as("r_days"),
        col("frequency"), col("monetary_cents"))
    val r1 = graft.Frame.withPrefixSum(base,
      Seq(col("r_days").asc, col("__u").asc), lit(1L), "__ri", "__rs")
    val r2 = graft.Frame.withPrefixSum(r1,
      Seq(col("frequency").desc, col("__u").asc), lit(1L), "__fi", "__fs")
    val r3 = graft.Frame.withPrefixSum(r2,
      Seq(col("monetary_cents").desc, col("__u").asc), lit(1L), "__mi", "__ms")
    def score(idx: String) =
      (lit(5L) - expr(s"$idx * 5 div ${n}L")).cast("int")
    r3.select(
        col("__u").as(userCol), col("r_days"),
        col("frequency"), col("monetary_cents"),
        score("__ri").as("r_score"),
        score("__fi").as("f_score"),
        score("__mi").as("m_score"))
      .withColumn("segment", concat(
        col("r_score").cast("string"),
        col("f_score").cast("string"),
        col("m_score").cast("string")))
  }

  def paretoConcentration(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val perKey = df
      .groupBy(col(keyCol).as("__k"))
      .agg(sum(col(weightCol)).as("__w"))
    val tot = perKey
      .agg(count(lit(1)).as("__n"), sum(col("__w")).as("__t"))
      .collect()(0)
    if (tot.getLong(0) == 0L)
      return Seq.empty[(Int, Long, Long, Option[Double])]
        .toDF("bucket", "keys", "weight", "cum_share")
    val (n, total) = (tot.getLong(0), tot.getLong(1))
    val ranked = graft.Frame.withPrefixSum(
      perKey,
      order = Seq(col("__w").desc, col("__k").asc),
      weight = col("__w"),
      idxName = "__idx", sumName = "__before")
    ranked
      .select(
        (expr(s"__idx * $buckets div ${n}L") + 1).cast("int").as("bucket"),
        col("__w"), (col("__before") + col("__w")).as("__thru"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("keys"), sum(col("__w")).as("weight"),
        round(max(col("__thru")).cast("double") /
          nullif(lit(total).cast("double"), lit(0.0)), 6).as("cum_share"))
  }
}
