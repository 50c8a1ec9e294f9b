package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget selection at scale: keep the best-quality documents per
  * group until the running token count crosses the budget.
  *
  * The direct formulation is ONE window per group key ordered by
  * (quality desc, id) — correct, but the group key (language) has ~5
  * values, so each group's entire corpus lands on one task: fatal at
  * 100 TB. This operator computes the IDENTICAL output two-phase:
  *
  *   1. Aggregate per (group, quality) stratum: one keyed shuffle to a
  *      relation whose size is the number of DISTINCT quality values —
  *      orders of magnitude smaller than the corpus. Cumulative stratum
  *      sums (a window over that small relation) yield each stratum's
  *      starting token offset.
  *   2. Join the offsets back (broadcast — the stratum relation is tiny),
  *      PRE-FILTER to strata starting below the budget (the scale win:
  *      the 100 TB tail never reaches a window), then a per-doc running
  *      sum windowed by (group, quality) — per-stratum tasks, bounded by
  *      stratum population, not by group population.
  *
  * A document is kept iff its cumulative start offset is < budget —
  * bitwise the same rule, rows and cum_tokens as the one-window
  * formulation (asserted in BudgetSpec).
  */
object Budget {

  /** Select docs per `groupCol` by descending `qCol` (ties by `idCol`
    * asc) while the running `ntCol` total starts below `budget`.
    * Output: (groupCol, idCol, qCol, ntCol, cum_tokens), where
    * cum_tokens is the running total INCLUDING the current row. */
  def tokenBudgetSelect(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      qCol: String,
      ntCol: String,
      budget: Long): DataFrame = {
    val strata = df
      .groupBy(col(groupCol), col(qCol))
      .agg(sum(col(ntCol)).as("__gsum"))
    val sw = Window
      .partitionBy(col(groupCol))
      .orderBy(col(qCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = strata
      .withColumn("__cum_end", sum(col("__gsum")).over(sw))
      .withColumn("__cum_start", col("__cum_end") - col("__gsum"))
      .select(col(groupCol), col(qCol), col("__cum_start"))
    val dw = Window
      .partitionBy(col(groupCol), col(qCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(offsets), Seq(groupCol, qCol))
      .filter(col("__cum_start") < budget) // prune before any doc-level window
      .withColumn("cum_tokens", col("__cum_start") + sum(col(ntCol)).over(dw))
      .filter(col("cum_tokens") - col(ntCol) < budget)
      .select(col(groupCol), col(idCol), col(qCol), col(ntCol), col("cum_tokens"))
  }

  /** MAX-MIN FAIR budget allocation across sources — water-filling:
    * given each source's token SUPPLY and a total TARGET, take every
    * small source whole and split what remains EVENLY across the
    * large ones (the level every uncapped source fills to), so no
    * source is favored beyond its supply. This is the mixture-planning
    * step upstream of the thinning operators (p28/p30 APPLY shares;
    * this COMPUTES takeable shares under supply caps — asking 20% from
    * a source that only has 3% silently re-weights everything else).
    *
    * Exact integer semantics (partitioning- and engine-independent):
    * sort sources by (supply, key); a source is capped iff every
    * source so far — itself included — satisfies
    *   supply_i ≤ (target − taken_before_i) div (sources_left_i),
    * the running-AND making the capped set the unique water-filling
    * prefix; uncapped sources get the level
    *   L = (target − Σ capped) div (#uncapped),
    * with the division remainder distributed +1 to the FIRST
    * `rem` uncapped sources in sort order, so Σ alloc == target
    * exactly (or Σ supply when the target exceeds it). Output one row
    * per source: (key, supply, alloc, capped, fill_level).
    *
    * Scale shape: the relation is source-level (domains can reach
    * millions), so BOTH running quantities — the prefix supply sum and
    * the running capped-AND — come from the distributed prefix sum
    * ([[graft.plans.PrefixSumExec]], a range-partitioned parallel
    * sort), never a single-task global window; the totals row
    * broadcasts. The corpus itself is never touched. */
  def waterFill(
      sources: DataFrame,
      keyCol: String,
      supplyCol: String,
      target: Long): DataFrame = {
    require(target >= 0L, s"target must be >= 0, got $target")
    val order = Seq(col("__s").asc, col(keyCol).asc)
    val p1 = graft.Frame.withPrefixSum(
      sources.select(col(keyCol), col(supplyCol).cast("long").as("__s")),
      order, col("__s"), "__idx0", "__pre")
      .withColumn("__idx", col("__idx0") + 1L)
    val m = p1.agg(count(lit(1)).as("__m"))
    val lvl = p1.crossJoin(broadcast(m))
      .withColumn("__lvl",
        expr(s"($target - __pre) div (__m - __idx + 1)"))
      .withColumn("__viol",
        when(col("__s") <= col("__lvl"), 0L).otherwise(1L))
    // running AND via a second prefix sum: capped iff no violation at
    // or before this row (exclusive prefix of violations + own flag)
    val base = graft.Frame.withPrefixSum(
      lvl, order, col("__viol"), "__idx1", "__violPre")
      .withColumn("__capped", col("__violPre") === 0L && col("__viol") === 0L)
    val cut = base
      .agg(
        sum(when(col("__capped"), col("__s")).otherwise(0L)).as("__taken"),
        sum(when(col("__capped"), 0L).otherwise(1L)).as("__nu"),
        max(when(col("__capped"), col("__idx")).otherwise(0L)).as("__lastc"))
      .select(col("__taken"), col("__nu"), col("__lastc"),
        when(col("__nu") > 0L,
          expr(s"($target - __taken) div __nu")).as("__L"),
        when(col("__nu") > 0L,
          expr(s"($target - __taken) % __nu")).as("__rem"))
    base.crossJoin(broadcast(cut))
      .select(
        col(keyCol), col("__s").as(supplyCol),
        when(col("__capped"), col("__s"))
          .otherwise(col("__L") +
            when(col("__idx") - col("__lastc") <= col("__rem"), 1L)
              .otherwise(0L)).as("alloc"),
        col("__capped").as("capped"),
        coalesce(col("__L"), lit(0L)).as("fill_level"))
  }
}
