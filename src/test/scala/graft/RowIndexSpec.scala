package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The custom RowIndexPlan/RowIndexExec operator: correct global
  * numbering, partition parallelism (no single-task WindowExec), and the
  * facade operators built on it. */
class RowIndexSpec extends SparkSpec {

  import spark.implicits._

  test("distributed row index equals the single-task window formulation") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val viaPlan = Frame.withRowIndex(
      df, Seq(col("l_orderkey"), col("l_linenumber")), "idx")
      .select(col("l_orderkey"), col("l_linenumber"), (col("idx") + 1).as("rn"))
    val viaWindow = df.select(
      col("l_orderkey"), col("l_linenumber"),
      row_number().over(
        Window.orderBy(col("l_orderkey"), col("l_linenumber"))).cast("long").as("rn"))
    assert(
      viaPlan.orderBy("rn").collect().map(_.toSeq).toSeq ==
        viaWindow.orderBy("rn").collect().map(_.toSeq).toSeq)
  }

  test("row index plan contains RowIndexExec, no WindowExec, >1 partition") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val indexed = Frame.withRowIndex(df, Seq(col("l_orderkey"), col("l_linenumber")), "idx")
    val physical = indexed.queryExecution.executedPlan.toString
    assert(physical.contains("RowIndex"))
    assert(!physical.contains("Window"))
    // parallel by construction: a range-partitioned exchange feeds the
    // operator (AQE may still coalesce tiny test data to one partition)
    assert(physical.contains("rangepartitioning"))
    // a dense 0-based index: min 0, max n-1, all distinct
    val stats = indexed.agg(
      min("idx"), max("idx"), count(lit(1)), countDistinct("idx")).head
    assert(stats.getLong(0) == 0L)
    assert(stats.getLong(1) == stats.getLong(2) - 1)
    assert(stats.getLong(3) == stats.getLong(2))
  }

  test("descending and expression orderings are honored") {
    val df = Seq((1L, "a"), (3L, "b"), (2L, "c")).toDF("k", "v")
    val got = Frame.withRowIndex(df, Seq(col("k").desc), "idx")
      .orderBy("idx").select("k").as[Long].collect()
    assert(got.toSeq == Seq(3L, 2L, 1L))
  }

  test("zip and chunkIds ride the distributed index with identical results") {
    val left = (1 to 100).map(i => (i.toLong, s"l$i")).toDF("lk", "lv")
    val right = (1 to 80).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    val zipped = Frame(left).zip(Seq(col("lk")), Frame(right), Seq(col("rk"))).df
    assert(zipped.count() == 80)
    val r = zipped.filter(col("lk") === 5L).head
    assert(r.getAs[String]("rv") == "r5")

    val chunks = Frame(left).chunkIds(30, Seq(col("lk"))).df
      .groupBy("chunk").count().orderBy("chunk").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(chunks.toSeq == Seq((0L, 30L), (1L, 30L), (2L, 30L), (3L, 10L)))
  }

  test("GlobalRowNumberRule rewrites unpartitioned row_number to RowIndexExec") {
    val prev = spark.experimental.extraOptimizations
    try {
      plans.GraftPlans.register(spark)
      val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_linenumber")
      val global = df.withColumn(
        "rn",
        row_number().over(Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
      val p = global.queryExecution.executedPlan.toString
      assert(p.contains("RowIndex"), p.take(2000))
      assert(!p.contains("Window ["), p.take(2000))
      // values identical to the builtin semantics: rn = 1..n in key order
      val got = global.orderBy("rn").limit(5).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
      val want = df.orderBy("l_orderkey", "l_linenumber").limit(5).collect()
        .map(_.toSeq).zipWithIndex
        .map { case (s, i) => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Int], i + 1) }
        .toSeq
      assert(got == want)
      // output column type matches the builtin (row_number is IntegerType)
      assert(global.schema("rn").dataType ==
        org.apache.spark.sql.types.IntegerType)

      // negative: a PARTITIONED row_number is untouched
      val part = df.withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))))
      val pp = part.queryExecution.executedPlan.toString
      assert(!pp.contains("RowIndex"), pp.take(2000))
    } finally spark.experimental.extraOptimizations = prev
  }
}
