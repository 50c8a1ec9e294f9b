package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass data profiling: per-column row/null/distinct counts plus
  * type-appropriate extremes — the ingest-time sanity report every
  * pipeline runs before committing a new corpus drop.
  *
  * Scale shape: ONE scan, one global aggregation — every statistic is a
  * mergeable aggregate, so partial aggregation happens map-side and a
  * single row crosses the exchange. The per-column reshape (one output
  * row per profiled column) happens AFTER aggregation on that one row.
  * With `exactDistinct = true` the multi-column distinct counts plan
  * through Catalyst's Expand (one shuffled pass carrying |cols| copies
  * of each row's key) — exact, oracle-checkable, and fine up to a few
  * columns; at 100 TB flip to `exactDistinct = false` for
  * `approx_count_distinct` (HLL±5%), which keeps the whole profile
  * map-side mergeable with constant state per column.
  */
object Profile {

  /** Profile `columns` of `df`: one output row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    * max_str, avg_len). Numeric extremes are cast to double; `avg_len`
    * is the mean string length over non-null values (round 6, exact
    * long-summed numerator). Fields inapplicable to the column's type
    * are null. */
  def profile(
      df: DataFrame,
      columns: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "Profile.profile: `columns` must be non-empty")
    val missing = columns.filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"Profile.profile: columns not in schema: ${missing.mkString(", ")} " +
        s"(available: ${df.schema.fieldNames.mkString(", ")})")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val structs: Seq[Column] = columns.map { name =>
      val dt = df.schema(name).dataType
      val c = col(name)
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      struct(
        lit(name).as("col_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(c)).as("n_nulls"),
        (if (exactDistinct) count_distinct(c)
         else approx_count_distinct(c)).as("n_distinct"),
        (if (isNum) min(c).cast("double") else nullD).as("min_num"),
        (if (isNum) max(c).cast("double") else nullD).as("max_num"),
        (if (isStr) min(c) else nullS).as("min_str"),
        (if (isStr) max(c) else nullS).as("max_str"),
        (if (isStr) round(sum(length(c)).cast("double") / count(c), 6)
         else nullD).as("avg_len"))
    }
    df.agg(structs.head.as("__p0"),
        structs.tail.zipWithIndex.map { case (s, i) => s.as(s"__p${i + 1}") }: _*)
      .select(explode(array(columns.indices.map(i => col(s"__p$i")): _*)).as("__p"))
      .select(col("__p.*"))
  }
}
