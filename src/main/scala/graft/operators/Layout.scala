package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.ZOrderN

/** Multi-dimensional data layout: Z-order clustering for write-once /
  * scan-many tables (the Delta/Iceberg OPTIMIZE ZORDER technique).
  *
  * A table range-partitioned and sorted by ONE column skips files only
  * for predicates on that column; a conjunctive box predicate on two+
  * columns still touches every file. Interleaving the columns' bin bits
  * ([[ZOrderN]]) gives every file a tight min/max bounding box in ALL
  * dimensions, so parquet footer stats (or partition pruning over an
  * explicit z-range column) exclude files on every predicate column at
  * once. At 100 TB this is the difference between scanning ~1/sqrt(F) of
  * the files per dimension and scanning all of them.
  *
  * Binning: linear min/max scaling to [0, 2^bits) — computed as a
  * single tiny aggregate broadcast into the plan (no driver collect, no
  * second job over the data). Linear bins are the documented choice:
  * rank/quantile bins are skew-robust but cost a sort; for key-like
  * integer columns (the common layout case) linear is exact enough.
  * Bin and z-value arithmetic is pure integer math — deterministic and
  * replayable in any engine (the q56 oracle recomputes it in SQL).
  */
object Layout {

  /** The z-value of `cols` binned to [0, 2^bits) by per-column min/max:
    * appends `zCol` plus one broadcast-aggregate join; no data shuffle.
    * Rows where any col is null get a null z-value (sort them last). */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 12,
      zCol: String = "__z"): DataFrame = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    val maxBin = (1L << bits) - 1
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        min(col(c)).cast("long").as(s"__lo$i"),
        max(col(c)).cast("long").as(s"__hi$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val bins: Seq[Column] = cols.zipWithIndex.map { case (c, i) =>
      // integer-exact linear bin (`div`, never float `/`); degenerate
      // (lo==hi) maps to bin 0
      when(col(s"__hi$i") === col(s"__lo$i"), lit(0L))
        .otherwise(expr(
          s"((cast(`$c` as bigint) - __lo$i) * ${maxBin}L) div (__hi$i - __lo$i)"))
    }
    df.crossJoin(broadcast(stats))
      .withColumn(zCol, ZOrderN(bits)(bins: _*))
      .drop(cols.indices.flatMap(i => Seq(s"__lo$i", s"__hi$i")): _*)
  }

  /** Cluster `df` for multi-column scans: z-value, range-partition on it
    * (files = contiguous z-ranges = tight N-dim boxes), sort within
    * partitions so parquet row-group stats are tight too, drop the
    * helper column. Write the result with `.write.parquet(...)`. */
  def zorderLayout(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int,
      bits: Int = 12): DataFrame = {
    val z = withZValue(df, cols, bits)
    z.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** File-level min/max manifest of a written table — the Iceberg/Delta
    * manifest idea as a plain relation: one row per file with each
    * column's bounds. Build it ONCE per written table (one distributed
    * scan), then every subsequent query prunes against metadata instead
    * of data. Persist it next to the table for reuse. */
  def fileStats(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Conjunctive-range file pruning over a manifest: keep files whose
    * [min,max] box intersects EVERY requested range. On a z-ordered
    * table the boxes are tight in all clustered dimensions, so this
    * eliminates most files for a multi-column box predicate (LayoutSpec
    * proves superset-correctness and the pruning ratio). */
  def pruneFiles(
      manifest: DataFrame,
      ranges: Map[String, (Long, Long)]): DataFrame =
    ranges.foldLeft(manifest) { case (m, (c, (lo, hi))) =>
      m.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
    }

  /** Read only the files a box predicate can touch (bounded driver
    * collect of FILE NAMES — metadata, never data). The result is a
    * SUPERSET of the matching rows; apply the row predicate after. */
  def prunedRead(
      spark: org.apache.spark.sql.SparkSession,
      manifest: DataFrame,
      ranges: Map[String, (Long, Long)]): DataFrame = {
    val files = pruneFiles(manifest, ranges)
      .select("file").collect().map(_.getString(0))
    require(files.nonEmpty, "no file intersects the requested ranges")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Hive-style partitioned write: one directory per distinct value of
    * `partitionCols` (`.../lang=en/source=web/part-*.parquet`). The
    * coarse-grained complement of [[zorderLayout]]: a filter on a
    * partition column prunes whole DIRECTORIES at planning time
    * (`PartitionFilters` in the scan, zero I/O for pruned values) vs
    * z-order's file/row-group stats pruning within a partition.
    *
    * Scale notes: choose low-cardinality columns (lang, source, date) —
    * a high-cardinality partition column explodes into millions of tiny
    * files. The pre-repartition on the partition columns lines tasks up
    * with output directories, so each partition value is written by the
    * tasks owning it instead of every task appending a sliver to every
    * directory (the classic small-files antipattern). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: need partition columns")
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read a [[writePartitioned]] dataset. Partition-column filters on
    * the result prune directories at planning time; LayoutSpec asserts
    * the pruned scan reads only the matching partition. */
  def readPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)
}
