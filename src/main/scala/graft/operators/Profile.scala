package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType, StringType}

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

  /** Pairwise Pearson correlation + population covariance over numeric
    * columns — one row per unordered pair (col_x < col_y in `columns`
    * order) with (col_x, col_y, n, cov_pop, corr), rounded to `roundTo`.
    *
    * Scale shape: ONE scan, one mergeable aggregation — all co-moments
    * (per-column sums and pairwise product sums) accumulate as EXACT
    * decimals in a single `agg`, so a single row crosses the exchange
    * and results are independent of partitioning and summation order.
    * The closed-form combine
    * `corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))`
    * then runs on that one row as a fixed sequence of IEEE-754 ops over
    * exact inputs — bit-replayable cross-engine.
    *
    * Rows containing a null in ANY profiled column are excluded first
    * (listwise deletion), so every pair shares the same `n`. A constant
    * column yields NaN corr (zero variance), as in R/pandas.
    *
    * Magnitude envelope: values quantize to decimal(18,6) (rounding
    * beyond 6 dp), products accumulate at decimal(38,12) — sums of
    * |x*y| up to ~1e26 stay exact, comfortably past 100 TB row counts
    * for typical measures. */
  def corrMatrix(
      df: DataFrame,
      columns: Seq[String],
      roundTo: Int = 6): DataFrame = {
    require(columns.size >= 2, "corrMatrix: need at least two columns")
    val missing = columns.filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty, s"corrMatrix: columns not in schema: ${missing.mkString(", ")}")
    val nonNum = columns.filterNot(c => df.schema(c).dataType.isInstanceOf[NumericType])
    require(nonNum.isEmpty, s"corrMatrix: non-numeric columns: ${nonNum.mkString(", ")}")

    def dec(c: String) = col(c).cast(DecimalType(18, 6))
    val pairs = for {
      i <- columns.indices; j <- i until columns.size
    } yield (columns(i), columns(j))
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        (columns.map(c => sum(dec(c)).cast("double").as(s"__s_$c")) ++
          pairs.map { case (a, b) =>
            sum(dec(a) * dec(b)).cast("double").as(s"__p_${a}__$b")
          })
    val nd = col("__n").cast("double")
    def sxy(a: String, b: String) = col(s"__p_${a}__$b")
    def s(c: String) = col(s"__s_$c")
    val outs = for {
      i <- columns.indices; j <- (i + 1) until columns.size
      a = columns(i); b = columns(j)
    } yield struct(
      lit(a).as("col_x"),
      lit(b).as("col_y"),
      col("__n").as("n"),
      round((nd * sxy(a, b) - s(a) * s(b)) / (nd * nd), roundTo).as("cov_pop"),
      round((nd * sxy(a, b) - s(a) * s(b)) /
        sqrt((nd * sxy(a, a) - s(a) * s(a)) * (nd * sxy(b, b) - s(b) * s(b))),
        roundTo).as("corr"))
    df.na.drop(columns)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(outs: _*)).as("__c"))
      .select(col("__c.*"))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], one output row per bucket — INCLUDING empty ones —
    * with (bin, lo_edge, hi_edge, n). The max value lands in the last
    * bucket; a constant column degenerates to everything in bin 0.
    *
    * Scale shape: two passes, both scale-safe. Pass 1 is a mergeable
    * min/max aggregate (one row); that row broadcasts onto the scan, so
    * pass 2 is scan-local arithmetic (`floor((x-lo)/(hi-lo)*bins)`,
    * every step one IEEE op — replayable cross-engine) followed by a
    * keyed aggregation over at most `bins` groups. The bucket spine
    * (for empty bins) explodes off the same single bounds row. No
    * global sort, no window, no data-sized shuffle. */
  def histogram(df: DataFrame, column: String, bins: Int): DataFrame = {
    require(bins > 0, s"histogram: bins must be positive, got $bins")
    require(df.schema.fieldNames.contains(column), s"histogram: no column $column")
    val bounds = df.na.drop(Seq(column)).agg(
      min(col(column)).cast("double").as("__lo"),
      max(col(column)).cast("double").as("__hi"))
    val x = col(column).cast("double")
    val bin = when(col("__hi") === col("__lo"), lit(0L)).otherwise(
      least(lit(bins - 1L),
        floor((x - col("__lo")) / (col("__hi") - col("__lo")) * bins)))
    val counts = df.na.drop(Seq(column))
      .crossJoin(broadcast(bounds))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("__cnt"))
    val spine = bounds
      .select(col("__lo"), col("__hi"),
        explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
      .select(
        col("bin"),
        round(col("__lo") + (col("__hi") - col("__lo")) * col("bin") / bins, 6)
          .as("lo_edge"),
        round(col("__lo") + (col("__hi") - col("__lo")) * (col("bin") + 1) / bins, 6)
          .as("hi_edge"))
    spine
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), col("lo_edge"), col("hi_edge"),
        coalesce(col("__cnt"), lit(0L)).as("n"))
  }

  /** Lexical corpus diagnostics per group: token/type counts,
    * type–token ratio, and the ZIPF SLOPE — the least-squares slope of
    * ln(frequency) on ln(rank) over the `topK` most frequent tokens.
    * Natural text sits near −1 (Zipf's law); a slope far above it
    * flags boilerplate/template floods, far below it flags
    * vocabulary-starved spam — a corpus-health gate that needs no
    * model and no reference corpus.
    *
    * Determinism contract (the g07 trick): both logs quantize to longs
    * at 1e6 BEFORE the regression, so all four regression sums are
    * exact integers accumulated order-free, and the slope is a single
    * double division rounded to 6 — bit-stable under partitioning and
    * oracle-replayable. Magnitudes: ln ≤ ~40e6 quantized, topK ≤ 10⁴ →
    * every sum stays far inside long range.
    *
    * Scale shape: one (group, token) count aggregation (map-side
    * partials — the same relation a tf build needs), one group-keyed
    * stats rollup, one per-group WindowGroupLimit for the top-K, one
    * tiny regression rollup over group×topK rows. Raw text never
    * shuffles past tokenization. */
  def zipfDiagnostics(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      topK: Int = 50): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val counts = docs
      .select(col(groupCol).as("__g"),
        explode(split(lower(col(textCol)), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val stats = counts
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_types"))
    val ranked = counts
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__g"))
          .orderBy(col("__c").desc, col("__t").asc)))
      .filter(col("__r") <= topK)
      .select(col("__g"),
        round(log(col("__r").cast("double")) * 1e6, 0).cast("long").as("__x"),
        round(log(col("__c").cast("double")) * 1e6, 0).cast("long").as("__y"))
    val reg = ranked
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).as("__k"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    stats
      .join(reg, Seq("__g"))
      .select(
        col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr"),
        when(col("__k") * col("__sxx") - col("__sx") * col("__sx") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            (col("__k") * col("__sxy") - col("__sx") * col("__sy"))
              .cast("double") /
              (col("__k") * col("__sxx") - col("__sx") * col("__sx"))
                .cast("double"), 6))
          .as("zipf_slope"))
  }
}
