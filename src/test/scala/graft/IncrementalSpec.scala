package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental

/** CDC merge + SCD2 semantics ([[graft.operators.Incremental]]). */
class IncrementalSpec extends SparkSpec {

  import spark.implicits._

  // (key, seq, op, payload) — op "D" = delete
  lazy val history = Seq(
    (1L, 1L, "U", "a"),
    (1L, 3L, "U", "b"),
    (2L, 1L, "U", "x"),
    (2L, 4L, "D", ""),
    (3L, 2L, "U", "y"),
    (3L, 5L, "D", ""),
    (3L, 6L, "U", "z"), // resurrection after delete
    (4L, 1L, "D", "")   // delete of a never-upserted key
  ).toDF("k", "seq", "op", "v")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    Incremental.mergeLatest(df, Seq("k"), Seq(col("seq")), col("op") === "D")

  test("mergeLatest keeps newest non-deleted state per key") {
    val got = snap(history).orderBy("k").select("k", "v").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "b"), (3L, "z")))
  }

  test("mergeLatest incremental identity: snapshot ++ newer delta == full fold") {
    for (split <- 1L to 6L) {
      val base = snap(history.filter(col("seq") < split))
      val delta = history.filter(col("seq") >= split)
      val inc = snap(base.unionByName(delta)).orderBy("k", "seq").collect().toSeq
      val full = snap(history).orderBy("k", "seq").collect().toSeq
      assert(inc == full, s"split=$split")
    }
  }

  test("mergeLatest ties on seq resolve by later seqCols") {
    val ties = Seq((1L, 1L, 10L, "old"), (1L, 1L, 11L, "new"))
      .toDF("k", "seq", "sub", "v")
    val got = Incremental
      .mergeLatest(ties, Seq("k"), Seq(col("seq"), col("sub")), lit(false))
      .select("v").as[String].collect()
    assert(got.toSeq == Seq("new"))
  }

  lazy val attrLog = Seq(
    (1L, 1L, "bronze"),
    (1L, 2L, "bronze"), // unchanged -> collapses into version 1
    (1L, 3L, "silver"),
    (1L, 7L, "gold"),
    (2L, 5L, "bronze")
  ).toDF("k", "seq", "tier")

  test("scd2 collapses runs and chains validity intervals") {
    val got = Incremental
      .scd2(attrLog, Seq("k"), Seq("tier"), col("seq"))
      .orderBy("k", "version")
      .select("k", "tier", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Long, Option[Long], Int, Boolean)]
      .collect()
      .toSeq
    assert(got == Seq(
      (1L, "bronze", 1L, Some(3L), 1, false),
      (1L, "silver", 3L, Some(7L), 2, false),
      (1L, "gold", 7L, None, 3, true),
      (2L, "bronze", 5L, None, 1, true)))
  }

  test("scd2 reverting to an earlier value opens a NEW version (type-2, not type-1)") {
    val flip = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a")).toDF("k", "seq", "tier")
    val got = Incremental.scd2(flip, Seq("k"), Seq("tier"), col("seq"))
      .orderBy("version").select("tier", "version").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("a", 1), ("b", 2), ("a", 3)))
  }

  test("fuzzySelfJoin finds within-block pairs, misses cross-block ones (documented recall)") {
    import graft.operators.Joins
    val names = Seq("red bolt", "red bol", "blue bolt", "blu belt").toDF("n")
    val got = Joins.fuzzySelfJoin(names, "n", maxDistance = 2,
        blocks = Seq(
          c => split(c, " ").getItem(0),
          c => element_at(split(c, " "), -1)))
      .orderBy("a", "b")
      .as[(String, String, Int)].collect().toSeq
    // "red bolt"/"red bol" share the first-token block (dist 1);
    // "blue bolt"/"red bolt" share the last-token block but dist 3 > 2;
    // "blu belt"/"blue bolt" is dist 3 AND shares no block — absent twice over.
    assert(got == Seq(("red bol", "red bolt", 1)))
  }

  test("mergeLatest rn=1 filter plans as WindowGroupLimit (per-partition top-1)") {
    val p = snap(history).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("scd2 plans a single exchange (second window reuses the key partitioning)") {
    val plan = Incremental.scd2(attrLog, Seq("k"), Seq("tier"), col("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(3000))
  }
}
