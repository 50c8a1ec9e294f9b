package graft

import org.apache.spark.sql.functions._

import graft.operators.Aggregates

/** [[Aggregates.exactHeavyHitters]]: sketch-guided pruning with exact
  * results — Misra–Gries candidates, pruned exact verify, and the
  * per-run certification bound. */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  // Zipf-ish: key k occurs 300/k times for k in 1..10 (so the 5th
  // hitter holds 60 > N/(16+1) ≈ 53 — certifiable at capacity 16),
  // plus 30 singleton noise keys to keep eviction pressure real
  private def skewed = ((1 to 10).flatMap(k => Seq.fill(300 / k)(k.toLong)) ++
    (100 to 129).map(_.toLong))
    .toDF("key")

  test("matches the full groupBy top-k exactly and certifies it") {
    val truth = skewed.groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Aggregates.exactHeavyHitters(skewed, "key", k = 5, capacity = 16)
      .orderBy(col("rank")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == truth.toSeq)
    assert(got.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    assert(got.forall(_.getAs[Boolean]("certified")))
  }

  test("partitioning-invariant under the certification bound") {
    val a = Aggregates.exactHeavyHitters(skewed, "key", 5, 16)
      .orderBy("rank").collect().toSeq
    val b = Aggregates.exactHeavyHitters(skewed.repartition(13), "key", 5, 16)
      .orderBy("rank").collect().toSeq
    val c = Aggregates.exactHeavyHitters(skewed.repartition(1), "key", 5, 16)
      .orderBy("rank").collect().toSeq
    assert(a == b && b == c)
  }

  test("near-uniform keys under a tiny summary: certified = false, never a silent lie") {
    val uniform = (1 to 2000).map(i => (i % 100).toLong).toDF("key")
    val got = Aggregates.exactHeavyHitters(uniform, "key", 5, capacity = 8)
      .collect()
    // 20-per-key uniform vs N/(8+1) = 222 bound: the run must refuse to
    // certify (the flag is the contract; candidates MAY still be right)
    assert(got.forall(!_.getAs[Boolean]("certified")))
  }

  test("plan stays scalable; bad params rejected") {
    graft.plans.PlanAudit.assertScalable(
      Aggregates.exactHeavyHitters(skewed, "key", 5, 16))
    intercept[IllegalArgumentException](
      Aggregates.exactHeavyHitters(skewed, "key", 0, 16))
    intercept[IllegalArgumentException](
      Aggregates.exactHeavyHitters(skewed, "key", 5, 5))
  }

  test("associationRules: hand-computed support/confidence/lift, cap and floor, repartition-stable") {
    // baskets: {1,2} x3, {1,3} x1, {2,3} x1, {9} x1  (6 baskets)
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L), (14L, 2L), (14L, 3L), (15L, 9L),
      (10L, 1L)) // duplicate item in a basket collapses
      .toDF("b", "i")
    def run(minSup: Long) =
      Aggregates.associationRules(rows, "b", "i", minSup, 16, 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .toSeq
    // pair (1,2): 3 baskets; n1=4, n2=4, N=6: support .5,
    // conf .75 both ways, lift 3*6/16 = 1.125
    val got = run(2L)
    assert(got == Seq((1L, 2L, 3L, 0.5, 0.75, 0.75, 1.125)))
    // floor 1 admits the singletons' pairs too, lift ordering holds
    val all = run(1L)
    assert(all.size == 3 && all.head == ((1L, 2L, 3L, 0.5, 0.75, 0.75, 1.125)))
    assert(all.map(_._7) == all.map(_._7).sorted.reverse)
    val again = Aggregates
      .associationRules(rows.repartition(7), "b", "i", 2L, 16, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toSeq
    assert(again == got)
    intercept[IllegalArgumentException](
      Aggregates.associationRules(rows, "b", "i", 0L, 16, 10))
  }

  test("paretoConcentration: hand-computed tiers, tie order, repartition-stable, empty input") {
    // weights desc: k3=60, k1=30, k2=8, k4=2 (total 100); 2 buckets ->
    // tier 1 = {k3,k1} carrying 90%, tier 2 = {k2,k4} closing at 100%
    val rows = Seq(
      ("k1", 10L), ("k1", 20L), ("k2", 8L), ("k3", 60L), ("k4", 2L))
      .toDF("key", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      Aggregates.paretoConcentration(df, "key", "w", buckets = 2)
        .orderBy(col("bucket"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    assert(run(rows) == Seq((1, 2L, 90L, 0.9), (2, 2L, 10L, 1.0)))
    assert(run(rows.repartition(5)) == run(rows))
    // equal weights: rank ties break on key, buckets stay balanced
    val ties = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("key", "w")
    assert(run(ties) == Seq((1, 2L, 10L, 0.5), (2, 2L, 10L, 1.0)))
    val empty = Seq.empty[(String, Long)].toDF("key", "w")
    assert(Aggregates.paretoConcentration(empty, "key", "w", 2).count() == 0L)
    intercept[IllegalArgumentException](
      Aggregates.paretoConcentration(rows, "key", "w", 0))
  }

  test("rfmSegments: hand-computed scores, recency inversion, quintile balance, repartition-stable, empty input") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // 10 users: user i's last purchase on day i, i purchases of 100*i
    // cents total — recency WORSENS with i while f/m IMPROVE, so
    // r_score and f/m scores must run in opposite directions
    val rows = for (i <- 1 to 10; j <- 1 to i)
      yield (i.toLong, ts(i), 100L * i / i) // i events of 100*i/i cents
    val df = rows.toDF("user_id", "ts", "cents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Aggregates.rfmSegments(d, "user_id", "ts", "cents")
        .orderBy(col("user_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
        .toSeq
    val got = run(df)
    assert(got.size == 10)
    // recency: user 10 bought last (r_days 0, score 5); user 1 first
    val byUser = got.map(r => r._1 -> r).toMap
    assert(byUser(10L)._2 == 0L && byUser(10L)._5 == 5)
    assert(byUser(1L)._2 == 9L && byUser(1L)._5 == 1)
    // frequency/monetary: user 10 has the most events and cents
    assert(byUser(10L)._6 == 5 && byUser(10L)._7 == 5)
    assert(byUser(1L)._6 == 1 && byUser(1L)._7 == 1)
    // exact rank quintiles over 10 users: every score twice per metric
    Seq(got.map(_._5), got.map(_._6), got.map(_._7)).foreach { ss =>
      assert(ss.groupBy(identity).view.mapValues(_.size).toMap ==
        Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2, 5 -> 2), s"quintiles: $ss")
    }
    // segment concatenates the three scores
    assert(byUser(10L)._8 == "555" && byUser(1L)._8 == "111")
    assert(run(df.repartition(7)) == got)
    // empty input keeps the schema
    assert(Aggregates.rfmSegments(df.filter(lit(false)),
      "user_id", "ts", "cents").collect().isEmpty)
  }
}
