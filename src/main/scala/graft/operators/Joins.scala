package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Multi-column equi-joins on identically-named columns, mirroring the
  * reference's four joins (acowley/Frames `src/Frames/Joins.hs:44-249`):
  * output schema = left columns ++ (right columns minus join columns)
  * (`mergeRec`, Joins.hs:29-41), which is exactly Spark's USING-join
  * column merge.
  *
  * Differences from the reference, by design (SURVEY §7.4):
  *   - outer/left/right joins null only the unmatched side (the reference
  *     wraps *every* column in Maybe — Spark's behavior is a lossless
  *     superset);
  *   - physical strategy (broadcast-hash vs shuffled-hash vs sort-merge)
  *     is left to Catalyst/AQE, which is the scale-correct choice; use
  *     [[innerJoinBroadcast]] only to force a small-dimension broadcast.
  *
  * The reference's O(n) discrimination-based grouping (Joins.hs:8-11) needs
  * no analogue: Spark's hash joins are O(n) per partition and distribute.
  */
object Joins {
  /** General USING-join with an explicit join type. */
  def join(keys: Seq[String], joinType: String)(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, joinType)

  def innerJoin(keys: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, "inner")

  def leftJoin(keys: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, "left")

  def rightJoin(keys: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, "right")

  def outerJoin(keys: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, "full")

  /** Spark-native supersets of the reference's join surface. */
  def semiJoin(keys: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, "left_semi")

  def antiJoin(keys: Seq[String])(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, keys, "left_anti")

  /** Inner join forcing a broadcast of the (small) right side — for
    * dimension tables below the AQE threshold that statistics miss. */
  def innerJoinBroadcast(keys: Seq[String])(l: DataFrame, dim: DataFrame): DataFrame =
    l.join(broadcast(dim), keys, "inner")
}
