package graft

import graft.operators.Experiments

/** Welch A/B readout: driver-replica exactness, unit-level collapse,
  * NULL guards, and arm hygiene. */
class ExperimentsSpec extends SparkSpec {

  import spark.implicits._

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's double formula replayed in plain Scala, same
    * operation order, from unit-level metric values in cents. */
  private def replica(c: Seq[Long], t: Seq[Long]): (Double, Double, Double, Double) = {
    def mom(xs: Seq[Long]) =
      (xs.size.toDouble, xs.sum.toDouble, xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble)
    val (n0, s0, ss0) = mom(c)
    val (n1, s1, ss1) = mom(t)
    val m0 = s0 / (100.0 * n0)
    val m1 = s1 / (100.0 * n1)
    val se0 = (ss0 - s0 * s0 / n0) / (n0 - 1.0) / 10000.0 / n0
    val se1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0) / 10000.0 / n1
    val se2 = se0 + se1
    (round6(m0), round6(m1),
      round6((m1 - m0) / math.sqrt(se2)),
      round6(se2 * se2 / (se0 * se0 / (n0 - 1.0) + se1 * se1 / (n1 - 1.0))))
  }

  test("welchAbTest: driver replica, per-unit collapse, NULL guards, arm hygiene") {
    val rows = Seq(
      // g: user 1's metric arrives as TWO events (40+60) — the unit
      // collapse must sum them before any moment is taken
      ("g", 0, 1L, 40L), ("g", 0, 1L, 60L), ("g", 0, 2L, 200L),
      ("g", 0, 3L, 300L),
      ("g", 1, 4L, 150L), ("g", 1, 5L, 350L),
      ("g", 2, 9L, 99999L), // arm outside {0,1}: ignored entirely
      // h: one treatment unit -> variance undefined -> NULL t/df
      ("h", 0, 1L, 100L), ("h", 0, 2L, 200L), ("h", 1, 3L, 100L),
      // i: both arms constant -> se2 = 0 -> NULL, not 0/0 noise
      ("i", 0, 1L, 100L), ("i", 0, 2L, 100L),
      ("i", 1, 3L, 100L), ("i", 1, 4L, 100L),
      // j: control only -> the group is dropped, not half-reported
      ("j", 0, 1L, 100L), ("j", 0, 2L, 200L)
    ).toDF("grp", "arm", "user", "cents")
    val got = Experiments.welchAbTest(rows, "grp", "arm", "user", "cents")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet == Set("g", "h", "i"))
    val (m0, m1, t, df) = replica(Seq(100L, 200L, 300L), Seq(150L, 350L))
    assert(got("g") == ((3L, 2L, m0, m1, Some(t), Some(df))))
    assert(got("h")._5.isEmpty && got("h")._6.isEmpty)
    assert(got("h")._1 == 2L && got("h")._2 == 1L)
    assert(got("i")._5.isEmpty && got("i")._6.isEmpty)
    assert(got("i")._3 == 1.0 && got("i")._4 == 1.0)
    // partitioning-invariant: exact same doubles whatever the layout
    val again = Experiments
      .welchAbTest(rows.repartition(7), "grp", "arm", "user", "cents")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    assert(again == got)
    intercept[IllegalArgumentException](
      Experiments.welchAbTest(rows, "grp", "arm", "user", "cents", scale = 0L))
  }
}
