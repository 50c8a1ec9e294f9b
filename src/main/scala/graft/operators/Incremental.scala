package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators for mutable datasets: CDC merge
  * (upsert/delete change streams folded into a snapshot) and SCD2
  * history construction (validity intervals for a changing attribute).
  *
  * Beyond the reference's scope (acowley/Frames is read-only over CSV),
  * but core to running the engine as a production pipeline: a 100 TB
  * corpus is never rewritten from scratch — it is maintained by merging
  * deltas. Both operators are single-keyed-shuffle window plans:
  *
  *   - [[mergeLatest]]'s `row_number = 1` filter plans as
  *     WindowGroupLimit (per-partition top-1 pre-filter before the
  *     exchange — each task forwards at most one row per key it sees),
  *     so the shuffle carries ~|keys| rows, not |changes|.
  *   - [[scd2]] evaluates lag + lead + row_number over ONE window
  *     specification, i.e. one shuffle and one sort per key partition.
  *
  * Neither touches a global (unpartitioned) window; both scale with the
  * key count per partition, never with total history length on one task.
  */
object Incremental {

  /** Fold a change stream into the latest-state snapshot: for every key,
    * keep the single newest row by `seqCols` (later elements break ties),
    * then drop rows whose newest change is a delete.
    *
    * The fundamental CDC identity — `mergeLatest(snapshot ++ delta)` ==
    * `mergeLatest(fullHistory)` whenever every delta row is newer than
    * the snapshot's high watermark — is what makes the operator
    * incremental: snapshots compose associatively with strictly-newer
    * deltas (asserted in IncrementalSpec and exercised as q57's query
    * shape). Deleted keys need no tombstones in the snapshot because a
    * strictly-newer delta can only resurrect them with an upsert.
    */
  def mergeLatest(
      changes: DataFrame,
      keys: Seq[String],
      seqCols: Seq[Column],
      isDelete: Column): DataFrame =
    mergeLatest(changes, keys, seqCols, isDelete, keepTombstones = false)

  /** [[mergeLatest]] with tombstone control: with `keepTombstones` the
    * newest row per key survives EVEN when it is a delete — the state a
    * continuously-maintained snapshot must keep so an out-of-order
    * OLDER upsert arriving later cannot resurrect a deleted key
    * (readers filter `isDelete`; compaction may drop tombstones once
    * past the late-data horizon). Without it, deleted keys vanish —
    * correct only when every future delta is strictly newer than the
    * snapshot (the q57 batch-merge identity). */
  def mergeLatest(
      changes: DataFrame,
      keys: Seq[String],
      seqCols: Seq[Column],
      isDelete: Column,
      keepTombstones: Boolean): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(seqCols.map(_.desc): _*)
    val newest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    if (keepTombstones) newest else newest.filter(!isDelete)
  }

  /** Build a slowly-changing-dimension type-2 history from an event log:
    * one output row per (key, run of equal `attrs` values), carrying
    * `valid_from` (first seq value of the run), `valid_to` (start of the
    * next run, null while current), `version` (1-based change ordinal)
    * and `is_current`.
    *
    * Consecutive rows with unchanged attributes collapse into the open
    * interval (the defining SCD2 property — history records *changes*,
    * not observations). All three window functions (lag for
    * change-detection, row_number for the version, lead for interval
    * close) share one (keys, seq) window spec = one shuffle + sort.
    */
  def scd2(
      log: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      seqCol: Column,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    val ord = (seqCol +: tiebreak).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val attrStruct = struct(attrs.map(col): _*)
    // Null-safe comparison: the first row per key (lag = null) and any
    // genuine attribute change both count as a new version.
    val changed = !(lag(attrStruct, 1).over(w) <=> attrStruct)
    val changesOnly = log
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .drop("__chg")
    // Second window over the change rows only (same key partitioning —
    // Catalyst reuses the exchange, adding just a per-partition sort).
    val wc = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    changesOnly
      .withColumn("valid_from", seqCol)
      .withColumn("valid_to", lead(seqCol, 1).over(wc))
      .withColumn("version", row_number().over(wc))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) ++ attrs.map(col) ++ Seq(
        col("valid_from"), col("valid_to"), col("version"), col("is_current"))): _*)
  }
}
