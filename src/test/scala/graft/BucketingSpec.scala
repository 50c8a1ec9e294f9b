package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed tables: the join/aggregation plans must contain NO Exchange —
  * the write-time bucket layout replaces the runtime shuffle. */
class BucketingSpec extends SparkSpec {

  test("bucketed join and aggregation plan with zero Exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", Seq("o_orderkey"), 8)
    // disable broadcast so the tiny test tables take the same sort-merge
    // path a 100 TB fact-to-fact join would
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(
        spark, "lineitem_b", "orders_b", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

      // values identical to the shuffled join
      val expected = lineitem.join(orders, Seq("o_orderkey")).count()
      assert(joined.count() == expected)

      // aggregation on the bucket key also skips the shuffle
      val agg = spark.table("lineitem_b")
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
