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
}
