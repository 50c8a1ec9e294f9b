package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Profile}

/** Randomized properties for the profiling/maintenance operators added
  * in round 5, with seeded generators (deterministic runs):
  *
  *   - corrMatrix agrees with a direct driver-side Pearson computation
  *     and is invariant under row order and partitioning;
  *   - histogram conserves mass (sum of bin counts = non-null rows) and
  *     every value lands in the bin whose edges contain it;
  *   - mergeLatest is incremental: folding (snapshot ++ newer delta)
  *     equals folding the full history, for random change streams.
  */
class ProfilePropSpec extends SparkSpec {

  import spark.implicits._

  test("corrMatrix matches a driver-side Pearson on random data, any partitioning") {
    val rnd = new Random(4242)
    val rows = Seq.tabulate(200) { i =>
      val x = rnd.nextDouble() * 100 - 50
      // y correlated with x, z independent
      (i.toLong, x, 0.7 * x + rnd.nextDouble() * 30, rnd.nextDouble() * 10)
    }
    val df = rows.toDF("id", "x", "y", "z")
    def run(parts: Int) =
      Profile.corrMatrix(df.repartition(parts), Seq("x", "y", "z"))
        .orderBy("col_x", "col_y")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    val a = run(1); val b = run(13)
    assert(a.toSeq == b.toSeq, "corr must be partitioning-independent")

    // direct computation over values quantized exactly like the operator
    def q(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def pearson(xs: Seq[BigDecimal], ys: Seq[BigDecimal]): Double = {
      val n = xs.size.toDouble
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(v => v * v).sum.toDouble
      val syy = ys.map(v => v * v).sum.toDouble
      val sxy = xs.zip(ys).map { case (u, v) => u * v }.sum.toDouble
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val xs = rows.map(r => q(r._2)); val ys = rows.map(r => q(r._3))
    val got = a.find(t => t._1 == "x" && t._2 == "y").get._3
    assert(math.abs(got - pearson(xs, ys)) < 1e-6, s"$got vs ${pearson(xs, ys)}")
    // correlated pair strong, independent pair weak
    assert(got > 0.8)
    val xz = a.find(t => t._1 == "x" && t._2 == "z").get._3
    assert(math.abs(xz) < 0.3)
  }

  test("histogram conserves mass and bins contain their values (random data)") {
    val rnd = new Random(7)
    for (trial <- 0 until 3) {
      val vals = Seq.fill(300)(rnd.nextDouble() * 1000 - 500)
      val df = vals.toDF("v")
      val bins = 7 + trial * 5
      val h = Profile.histogram(df, "v", bins).orderBy("bin").collect()
      assert(h.length == bins)
      assert(h.map(_.getLong(3)).sum == vals.size, "mass must be conserved")
      // recompute each value's bin from the edges: count must match
      val lo = vals.min; val hi = vals.max
      val expected = vals.groupBy { v =>
        math.min(bins - 1, math.floor((v - lo) / (hi - lo) * bins).toLong)
      }.view.mapValues(_.size.toLong).toMap
      h.foreach { r =>
        assert(r.getLong(3) == expected.getOrElse(r.getLong(0), 0L),
          s"bin ${r.getLong(0)} count mismatch in trial $trial")
      }
    }
  }

  test("mergeLatest incremental identity on random change streams") {
    val rnd = new Random(99)
    val history = Seq.tabulate(400) { seq =>
      (rnd.nextInt(40).toLong, s"v$seq", seq.toLong, rnd.nextInt(5) == 0)
    }
    val (snapshotPart, deltaPart) = history.partition(_._3 < 250)
    def fold(rows: Seq[(Long, String, Long, Boolean)]) =
      Incremental.mergeLatest(
        rows.toDF("k", "v", "seq", "del"),
        Seq("k"), Seq(col("seq")), col("del"))
    val snapshot = fold(snapshotPart)
    // every delta row is strictly newer than the snapshot watermark, so
    // folding snapshot ++ delta must equal folding the full history
    val viaSnapshot = Incremental.mergeLatest(
      snapshot.unionByName(deltaPart.toDF("k", "v", "seq", "del")),
      Seq("k"), Seq(col("seq")), col("del"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val direct = fold(history)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSnapshot == direct)
  }
}
