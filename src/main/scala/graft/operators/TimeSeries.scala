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
}
