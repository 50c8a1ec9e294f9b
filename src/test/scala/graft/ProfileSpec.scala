package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** One-pass profiler semantics and scale shape. */
class ProfileSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("aa"), Some(2.0)),
      (2L, None, Some(4.0)),
      (3L, Some("bbbb"), None),
      (4L, Some("aa"), Some(8.0))
    ).toDF("id", "s", "v")
  }

  test("null, distinct, and extreme accounting") {
    val p = Profile.profile(df, Seq("id", "s", "v"))
      .orderBy("col_name").collect()
    val byName = p.map(r => r.getString(0) -> r).toMap
    val id = byName("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    val s = byName("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(6) == "aa" && s.getString(7) == "bbbb")
    // avg_len over non-null values: (2 + 4 + 2) / 3
    assert(math.abs(s.getDouble(8) - 8.0 / 3) < 1e-6)
    val v = byName("v")
    assert(v.getLong(2) == 1 && v.getDouble(4) == 2.0 && v.getDouble(5) == 8.0)
    assert(v.isNullAt(6) && v.isNullAt(7) && v.isNullAt(8))
  }

  test("empty column list and unknown columns fail fast with clear messages") {
    val e1 = intercept[IllegalArgumentException](Profile.profile(df, Seq()))
    assert(e1.getMessage.contains("non-empty"))
    val e2 = intercept[IllegalArgumentException](
      Profile.profile(df, Seq("id", "nope", "wat")))
    assert(e2.getMessage.contains("nope") && e2.getMessage.contains("wat"))
  }

  test("corrMatrix matches closed-form Pearson on known data") {
    import spark.implicits._
    // y = 2x exactly (corr 1); z anti-correlated with x.
    val d = Seq((1.0, 2.0, 9.0), (2.0, 4.0, 7.0), (3.0, 6.0, 5.0), (4.0, 8.0, 1.0))
      .toDF("x", "y", "z")
    val rows = graft.operators.Profile.corrMatrix(d, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y").collect()
    assert(rows.length == 3)
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byPair(("x", "y")).getDouble(4) == 1.0)
    assert(byPair(("x", "y")).getLong(2) == 4)
    // cov_pop(x,y) = E[xy] - E[x]E[y] = 15 - 2.5*5 = 2.5
    assert(byPair(("x", "y")).getDouble(3) == 2.5)
    assert(byPair(("x", "z")).getDouble(4) < -0.9)
    // null rows are excluded listwise: same n for every pair
    val withNull = d.union(Seq((5.0, 10.0, Double.NaN)).toDF
      .select(col("_1"), col("_2"), lit(null).cast("double")))
    val n2 = graft.operators.Profile.corrMatrix(withNull, Seq("x", "y", "z"))
      .collect().map(_.getLong(2)).toSet
    assert(n2 == Set(4L))
  }

  test("corrMatrix is one scan / one aggregate and validates input") {
    val plan = graft.operators.Profile
      .corrMatrix(df.selectExpr("id", "v", "id * 2 as w"), Seq("id", "v", "w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "co-moments must fuse into one aggregation")
    intercept[IllegalArgumentException](
      graft.operators.Profile.corrMatrix(df, Seq("id")))
    intercept[IllegalArgumentException](
      graft.operators.Profile.corrMatrix(df, Seq("id", "s")))
    intercept[IllegalArgumentException](
      graft.operators.Profile.corrMatrix(df, Seq("id", "nope")))
  }

  test("histogram covers the range, keeps empty bins, and handles edges") {
    import spark.implicits._
    val d = Seq(0.0, 1.0, 2.0, 9.0, 10.0).toDF("v")
    val h = graft.operators.Profile.histogram(d, "v", bins = 5)
      .orderBy("bin").collect()
    assert(h.length == 5)
    assert(h.map(_.getLong(3)).sum == 5)
    // max value lands in the LAST bin, not a phantom bins-th bucket
    assert(h.last.getLong(3) == 2) // 9.0 and 10.0
    // middle of the range is empty but still materialized
    assert(h(2).getLong(3) == 0)
    assert(h.head.getDouble(1) == 0.0 && h.last.getDouble(2) == 10.0)
    // constant column: everything in bin 0
    val c = Seq(3.0, 3.0, 3.0).toDF("v")
    val hc = graft.operators.Profile.histogram(c, "v", bins = 4)
      .orderBy("bin").collect()
    assert(hc.head.getLong(3) == 3 && hc.map(_.getLong(3)).sum == 3)
    intercept[IllegalArgumentException](
      graft.operators.Profile.histogram(d, "v", bins = 0))
    intercept[IllegalArgumentException](
      graft.operators.Profile.histogram(d, "nope", bins = 2))
  }

  test("approx mode agrees on tiny data and plans without Expand") {
    val approx = Profile.profile(df, Seq("id", "s", "v"), exactDistinct = false)
    assert(approx.orderBy("col_name").collect().map(_.getLong(3)).toSeq ==
      Seq(4L, 2L, 3L))
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx profile must stay one-pass mergeable")
  }

  // ---------------- Zipf diagnostics ----------------

  test("zipfDiagnostics: counts, ttr, and hand-replayed quantized regression") {
    import spark.implicits._
    // group A: "a"×8 "b"×4 "c"×2 "d"×1 (a geometric rank-frequency),
    // group B: every token once (slope undefined at equal counts? no —
    // counts all 1, ln(c)=0 for every rank, slope = 0)
    val aText = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq(("A", aText), ("B", "u v w x")).toDF("g", "text")
    val out = Profile.zipfDiagnostics(docs, "g", "text", topK = 50)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_tokens") == 15L && a.getAs[Long]("n_types") == 4L)
    assert(a.getAs[Double]("ttr") == 0.266667)
    // replay the quantized regression in test code
    val pts = Seq((1, 8), (2, 4), (3, 2), (4, 1)).map { case (r, c) =>
      (math.round(math.log(r.toDouble) * 1e6),
        math.round(math.log(c.toDouble) * 1e6)) }
    val (k, sx, sy) = (pts.size.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = BigDecimal((k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getAs[Double]("zipf_slope") == slope)
    // near -1.5 for this halving distribution (ln2-per-rank-step bends it)
    assert(slope < -1.0 && slope > -2.0)
    val b = out("B")
    assert(b.getAs[Long]("n_types") == 4L && b.getAs[Double]("zipf_slope") == 0.0)
  }

  test("zipfDiagnostics: partitioning-invariant; single-type group yields null slope") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (s"g${i % 2}",
      (1 to (i % 5 + 1)).map(j => s"tok${(i * j) % 13}").mkString(" ")))
      .toDF("g", "text")
    val a = Profile.zipfDiagnostics(docs, "g", "text").orderBy("g").collect().toSeq
    val b = Profile.zipfDiagnostics(docs.repartition(7), "g", "text")
      .orderBy("g").collect().toSeq
    assert(a == b)
    // one distinct token: k=1 → zero denominator → null, not a crash
    val one = Profile.zipfDiagnostics(
      Seq(("s", "same same same")).toDF("g", "text"), "g", "text").collect().head
    assert(one.isNullAt(one.fieldIndex("zipf_slope")))
    intercept[IllegalArgumentException](
      Profile.zipfDiagnostics(docs, "g", "text", topK = 1))
  }
}
