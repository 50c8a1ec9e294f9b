package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.HllDistinct

/** Ground truth for the custom HLL aggregate: accuracy within the
  * published error envelope, and bit-identical results under any
  * partitioning (the property that makes it safe — and oracle-able — on
  * a cluster). */
class HllSpec extends SparkSpec {

  import spark.implicits._

  test("estimate is within the m=256 error envelope (~6.5% sigma)") {
    val n = 5000
    val df = (1L to n).toDF("v")
    val est = df.agg(HllDistinct(col("v")).as("e")).head.getDouble(0)
    assert(math.abs(est - n) / n < 0.2, s"estimate $est for exact $n")
  }

  test("small cardinalities hit the linear-counting range exactly") {
    val df = (1L to 30L).toDF("v")
    val est = df.agg(HllDistinct(col("v")).as("e")).head.getDouble(0)
    // 30 distinct over 256 registers: linear counting is near-exact
    assert(math.abs(est - 30.0) < 3.0, s"estimate $est for exact 30")
  }

  test("result is identical under any partitioning (merge is order-free)") {
    val vals = (1L to 2000L).map(v => v * 2654435761L)
    val a = vals.toDF("v").repartition(1)
      .agg(HllDistinct(col("v"))).head.getDouble(0)
    val b = vals.toDF("v").repartition(13)
      .agg(HllDistinct(col("v"))).head.getDouble(0)
    val c = vals.reverse.toDF("v").repartition(7)
      .agg(HllDistinct(col("v"))).head.getDouble(0)
    assert(a == b && b == c, s"partitioning changed the sketch: $a $b $c")
  }

  test("nulls are ignored; duplicates do not move the estimate") {
    val base = (1L to 100L).toDF("v")
    val withDups = ((1L to 100L) ++ (1L to 100L)).toDF("v")
    val e1 = base.agg(HllDistinct(col("v"))).head.getDouble(0)
    val e2 = withDups.agg(HllDistinct(col("v"))).head.getDouble(0)
    val e3 = base.select(when(col("v") > 0, col("v")).as("v"))
      .union(Seq.empty[Option[Long]].toDF("v"))
      .agg(HllDistinct(col("v"))).head.getDouble(0)
    assert(e1 == e2, s"duplicates moved the estimate: $e1 vs $e2")
    assert(e1 == e3, s"null path changed the estimate: $e1 vs $e3")
  }
}
