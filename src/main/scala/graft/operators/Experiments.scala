package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation readout: the unequal-variance two-sample t-test
  * (Welch 1947) per metric group, computed at the UNIT of randomization.
  *
  * A/B analysis over an event log has one statistical trap and one
  * distributed-systems trap, and this operator closes both:
  *
  *   - *Statistical*: events from one user are correlated, so testing
  *     event-level values overstates significance. The operator first
  *     collapses events to one metric value per (group, arm, unit) —
  *     revenue per user, not revenue per event — and runs the test over
  *     UNITS, the randomization granularity (Deng et al., KDD'17's
  *     "analysis unit = randomization unit" rule).
  *   - *Distributed*: both stages are keyed partial aggregations (unit
  *     collapse, then arm moments) — two map-side-combined shuffles
  *     whose output is one row per (group, arm); no window, no collect,
  *     no per-group iteration. The moment state is (n, Σm, Σm²) with
  *     Σm² accumulated in DECIMAL(38,0) (the s09 discipline: integer
  *     squares of quantized metrics overflow longs near 1e10 units,
  *     decimals never do), so the sums are EXACT and order-free and the
  *     final Welch arithmetic is one fixed-shape double expression per
  *     group — bit-replayable by an oracle that follows the same
  *     formula (q77's gate).
  *
  * Input metric `qCol` must be an integer-quantized value (e.g. cents),
  * the same exactness contract as [[Graph]]/[[Clustering]]; `armCol`
  * must be 0 (control) / 1 (treatment). Output per group: unit counts,
  * arm means (descaled by `scale`), Welch t and its Welch–Satterthwaite
  * degrees of freedom, both NULL when either arm has < 2 units (the
  * variance is undefined there — a NULL, not a silent 0). */
object Experiments {

  def welchAbTest(
      df: DataFrame,
      groupCol: String,
      armCol: String,
      unitCol: String,
      qCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val unit = df
      .groupBy(col(groupCol), col(armCol).cast("int").as("__arm"), col(unitCol))
      .agg(sum(col(qCol).cast("long")).as("__m"))
    val dec = col("__m").cast("decimal(38,0)")
    val arm = unit
      .groupBy(col(groupCol), col("__arm"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__m")).as("__s"),
        sum(dec * dec).as("__ss"))
    def pick(c: String, a: Int) =
      max(when(col("__arm") === a, col(c))).as(s"${c}_$a")
    val wide = arm
      .groupBy(col(groupCol))
      .agg(
        pick("__n", 0), pick("__s", 0), pick("__ss", 0),
        pick("__n", 1), pick("__s", 1), pick("__ss", 1))
      .filter(col("__n_0").isNotNull && col("__n_1").isNotNull)
    // fixed-shape IEEE double arithmetic from the exact integer moments:
    // identical expression order on the oracle side replays it bit-for-bit
    def m(a: Int) =
      col(s"__s_$a").cast("double") /
        (lit(scale.toDouble) * col(s"__n_$a").cast("double"))
    def v(a: Int) = {
      val n = col(s"__n_$a").cast("double")
      val s = col(s"__s_$a").cast("double")
      (col(s"__ss_$a").cast("double") - s * s / n) /
        (n - lit(1.0)) / lit(scale.toDouble * scale.toDouble)
    }
    def se(a: Int) = v(a) / col(s"__n_$a").cast("double")
    val se2 = se(0) + se(1)
    val tStat = (m(1) - m(0)) / sqrt(se2)
    val dfW = (se2 * se2) /
      (se(0) * se(0) / (col("__n_0").cast("double") - lit(1.0)) +
        se(1) * se(1) / (col("__n_1").cast("double") - lit(1.0)))
    // also NULL when both arms are constant (se2 = 0): 0/0 is engine
    // noise, not a statistic
    val ok = col("__n_0") > 1 && col("__n_1") > 1 && se2 > lit(0.0)
    wide.select(
      col(groupCol),
      col("__n_0").as("n_control"),
      col("__n_1").as("n_treat"),
      round(m(0), 6).as("mean_control"),
      round(m(1), 6).as("mean_treat"),
      when(ok, round(tStat, 6)).as("welch_t"),
      when(ok, round(dfW, 6)).as("welch_df"))
  }

  /** CUPED-adjusted readout (Deng, Xu, Kohavi & Walker, WSDM'13): the
    * variance-reduction companion to [[welchAbTest]]. Each unit's
    * experiment metric Y is adjusted by its PRE-experiment covariate X
    * (Y′ = Y − θ·(X − X̄), θ = cov(X,Y)/var(X) pooled over both arms —
    * pre-period behavior is arm-independent by randomization, so the
    * adjustment shrinks variance without biasing the lift), and the
    * Welch test runs on Y′.
    *
    * The scale trick: Y′ is NEVER materialized per unit. Every adjusted
    * statistic is algebra over the exact integer moment matrix —
    * var(Y′) = var(Y) − 2θ·cov(X,Y) + θ²·var(X), mean_a(Y′) =
    * mean_a(Y) − θ·(mean_a(X) − X̄_pool) — so one keyed aggregation
    * pass (unit collapse, then per-arm {n, ΣX, ΣY, ΣX², ΣY², ΣXY} with
    * the Σ-of-products in DECIMAL(38,0)) yields the whole readout, the
    * per-unit double subtraction that would make results
    * partitioning-dependent never happens, and the oracle replays the
    * same fixed-shape formula bit-for-bit. `var_reduction` is pooled
    * ρ²(X,Y) — the fraction of metric variance the covariate removed,
    * the number a platform uses to justify CUPED's bookkeeping.
    *
    * Input rows are events carrying BOTH quantized columns (`yQCol`
    * experiment-period metric, `xQCol` pre-period covariate, zero
    * outside their windows); the unit collapse sums each. θ falls back
    * to 0 (plain Welch) when the pooled covariate is constant. t/df
    * are NULL under the same guards as [[welchAbTest]]. */
  def cupedAbTest(
      df: DataFrame,
      groupCol: String,
      armCol: String,
      unitCol: String,
      yQCol: String,
      xQCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val unit = df
      .groupBy(col(groupCol), col(armCol).cast("int").as("__arm"), col(unitCol))
      .agg(
        sum(col(yQCol).cast("long")).as("__y"),
        sum(col(xQCol).cast("long")).as("__x"))
    def d38(c: String) = col(c).cast("decimal(38,0)")
    val arm = unit
      .groupBy(col(groupCol), col("__arm"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__y")).as("__sy"),
        sum(col("__x")).as("__sx"),
        sum(d38("__y") * d38("__y")).as("__syy"),
        sum(d38("__x") * d38("__x")).as("__sxx"),
        sum(d38("__x") * d38("__y")).as("__sxy"))
    def pick(c: String, a: Int) =
      max(when(col("__arm") === a, col(c))).as(s"${c}_$a")
    val picks = for {
      c <- Seq("__n", "__sy", "__sx", "__syy", "__sxx", "__sxy")
      a <- Seq(0, 1)
    } yield pick(c, a)
    val wide = arm
      .groupBy(col(groupCol))
      .agg(picks.head, picks.tail: _*)
      .filter(col("__n_0").isNotNull && col("__n_1").isNotNull)
    def dbl(c: String) = col(c).cast("double")
    // pooled moments: exact integer/decimal adds BEFORE any cast
    val nP = (col("__n_0") + col("__n_1")).cast("double")
    val sxP = (col("__sx_0") + col("__sx_1")).cast("double")
    val syP = (col("__sy_0") + col("__sy_1")).cast("double")
    val sxxP = (col("__sxx_0") + col("__sxx_1")).cast("double")
    val syyP = (col("__syy_0") + col("__syy_1")).cast("double")
    val sxyP = (col("__sxy_0") + col("__sxy_1")).cast("double")
    val varxP = (sxxP - sxP * sxP / nP) / (nP - lit(1.0))
    val varyP = (syyP - syP * syP / nP) / (nP - lit(1.0))
    val covP = (sxyP - sxP * syP / nP) / (nP - lit(1.0))
    val theta = when(varxP > lit(0.0), covP / varxP).otherwise(lit(0.0))
    val mxP = sxP / nP
    def n(a: Int) = dbl(s"__n_$a")
    def madj(a: Int) =
      dbl(s"__sy_$a") / n(a) - theta * (dbl(s"__sx_$a") / n(a) - mxP)
    def vy(a: Int) =
      (dbl(s"__syy_$a") - dbl(s"__sy_$a") * dbl(s"__sy_$a") / n(a)) /
        (n(a) - lit(1.0))
    def vx(a: Int) =
      (dbl(s"__sxx_$a") - dbl(s"__sx_$a") * dbl(s"__sx_$a") / n(a)) /
        (n(a) - lit(1.0))
    def cxy(a: Int) =
      (dbl(s"__sxy_$a") - dbl(s"__sx_$a") * dbl(s"__sy_$a") / n(a)) /
        (n(a) - lit(1.0))
    def se(a: Int) =
      (vy(a) - lit(2.0) * theta * cxy(a) + theta * theta * vx(a)) / n(a)
    val se2 = se(0) + se(1)
    val tStat = (madj(1) - madj(0)) / sqrt(se2)
    val dfW = (se2 * se2) /
      (se(0) * se(0) / (n(0) - lit(1.0)) + se(1) * se(1) / (n(1) - lit(1.0)))
    val vred = when(varxP > lit(0.0) && varyP > lit(0.0),
      covP * covP / (varxP * varyP)).otherwise(lit(0.0))
    val ok = col("__n_0") > 1 && col("__n_1") > 1 && se2 > lit(0.0)
    val sD = lit(scale.toDouble)
    wide.select(
      col(groupCol),
      col("__n_0").as("n_control"),
      col("__n_1").as("n_treat"),
      round(theta, 6).as("theta"),
      round(madj(0) / sD, 6).as("mean_control_adj"),
      round(madj(1) / sD, 6).as("mean_treat_adj"),
      when(ok, round(tStat, 6)).as("welch_t_adj"),
      when(ok, round(dfW, 6)).as("welch_df_adj"),
      round(vred, 6).as("var_reduction"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group: the
    * NONPARAMETRIC complement to q77's Welch t — distribution-shape
    * shifts (variance, tails, bimodality) that leave the mean
    * untouched, the readout a guardrail metric needs. D = max over
    * observed values of |F̂₀(v) − F̂₁(v)| computed EXACTLY: the CDFs
    * never materialize as doubles — the max runs over the integer
    * cross-product |cum₀·n₁ − cum₁·n₀|, one division at the end
    * (round 6). `valueCol` must be integral (quantize upstream — the
    * house grid rule); ties in D break toward the smallest value.
    *
    * Scale shape: one (group, value)-keyed tally with map-side
    * partials collapses the stream to the per-group value GRID; the
    * running counts then come from a TWO-LEVEL group-keyed prefix sum
    * (the distributed-scan decomposition, same family as
    * [[graft.plans.PrefixSumExec]]): values bucket into 2^`blockBits`
    * -wide blocks, the within-block cumsum is a window PARTITIONED BY
    * (group, block) — each task holds at most 2^blockBits grid rows —
    * and the cross-block offsets come from a per-group window over the
    * BLOCK relation (≤ range/2^blockBits rows per group, never the
    * grid). No single task ever serializes a group's whole value grid,
    * so a wide-range metric (microseconds, token counts) costs
    * max(2^blockBits, range/2^blockBits) rows per task instead of
    * `range`. Results are bit-identical to the one-window form — the
    * decomposition is pure associativity of +. Arm sizes join back
    * from a group-keyed aggregate of the same tally (broadcast under
    * AQE). Output: (group, n0, n1, ks_d, ks_at) — NULL D when either
    * arm is empty. */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      armCol: String,
      valueCol: String,
      blockBits: Int = 16): DataFrame = {
    require(blockBits >= 1 && blockBits <= 40,
      s"blockBits must be in [1, 40], got $blockBits")
    val base = df.select(col(groupCol).as("__g"),
      col(armCol).cast("int").as("__a"),
      col(valueCol).cast("long").as("__v"))
    val counts = base
      .groupBy(col("__g"), col("__v"))
      .agg(
        sum(when(col("__a") === 0, 1L).otherwise(0L)).as("__c0"),
        sum(when(col("__a") === 1, 1L).otherwise(0L)).as("__c1"))
      // arithmetic shift floors toward -inf, so the block key is
      // monotonic in __v for negative values too
      .withColumn("__blk", shiftright(col("__v"), blockBits))
    // level 1: within-block running counts — partitioned by (g, block),
    // each task bounded by the block width, never the group's grid
    val wIn = Window.partitionBy(col("__g"), col("__blk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // level 2: exclusive prefix of block totals — per group over BLOCK
    // rows (range >> blockBits of them), not grid rows
    val wBlk = Window.partitionBy(col("__g")).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .groupBy(col("__g"), col("__blk"))
      .agg(sum(col("__c0")).as("__b0"), sum(col("__c1")).as("__b1"))
      .select(col("__g"), col("__blk"),
        coalesce(sum(col("__b0")).over(wBlk), lit(0L)).as("__o0"),
        coalesce(sum(col("__b1")).over(wBlk), lit(0L)).as("__o1"))
    val tot = counts.groupBy(col("__g"))
      .agg(sum(col("__c0")).as("__n0"), sum(col("__c1")).as("__n1"))
    counts
      .withColumn("__i0", sum(col("__c0")).over(wIn))
      .withColumn("__i1", sum(col("__c1")).over(wIn))
      .join(offsets, Seq("__g", "__blk"))
      .withColumn("__cum0", col("__i0") + col("__o0"))
      .withColumn("__cum1", col("__i1") + col("__o1"))
      .join(tot, Seq("__g"))
      .select(col("__g"),
        col("__n0"), col("__n1"), col("__v"),
        abs(col("__cum0") * col("__n1") - col("__cum1") * col("__n0"))
          .as("__d"))
      .groupBy(col("__g"))
      .agg(
        max(col("__n0")).as("n0"), max(col("__n1")).as("n1"),
        // lexicographic struct max: largest D, then smallest value
        max(struct(col("__d"), (-col("__v")).as("__nv"))).as("__m"))
      .select(col("__g").as(groupCol), col("n0"), col("n1"),
        when(col("n0") > 0 && col("n1") > 0,
          round(col("__m.__d").cast("double") /
            (col("n0").cast("double") * col("n1").cast("double")), 6))
          .as("ks_d"),
        when(col("n0") > 0 && col("n1") > 0, -col("__m.__nv")).as("ks_at"))
  }
}
