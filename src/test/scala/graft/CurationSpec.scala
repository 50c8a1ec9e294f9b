package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** [[Curation.snapshotDiff]] semantics (ruleFilter is gated by the t15
  * oracle; the diff gets its spec here plus the p24 oracle). */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("snapshotDiff: added/removed/changed/unchanged partition both id spaces") {
    val before = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")
    ).toDF("id", "text")
    val after = Seq(
      (1L, "alpha"),         // unchanged
      (2L, "beta edited"),   // changed
      (4L, "delta"),         // unchanged  (3 removed)
      (5L, "epsilon")        // added
    ).toDF("id", "text")
    val got = Curation.snapshotDiff(before, after, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
    // pure function of content: repartitioning changes nothing
    val again = Curation
      .snapshotDiff(before.repartition(5), after.repartition(3), "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
    // multi-column content: a change in EITHER column is a change
    val b2 = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "t1", "t2")
    val a2 = Seq((1L, "a", "z"), (2L, "b", "y")).toDF("id", "t1", "t2")
    val got2 = Curation.snapshotDiff(b2, a2, "id", Seq("t1", "t2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(1L -> "changed", 2L -> "unchanged"))
    // identical snapshots: all unchanged, diff list empty
    assert(Curation.snapshotDiff(before, before, "id", Seq("text"))
      .filter(col("status") =!= "unchanged").count() == 0L)
  }
}
