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
}
