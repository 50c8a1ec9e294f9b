package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, Dedup, Similarity}

/** Bucketed tables: the join/aggregation plans must contain NO Exchange —
  * the write-time bucket layout replaces the runtime shuffle. */
class BucketingSpec extends SparkSpec {

  test("persisted IVF index: probe equals inline ivfKnn; index side unshuffled, buckets pruned") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val centroids = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
      "ivf_idx_spec", numBuckets = 16)
    try {
      val queries = emb.filter(col("vec_id") < 5)
      def run(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      val probe = Similarity.probeIvfIndex(spark, "ivf_idx_spec", queries,
        "vec_id", "embedding", k = 5, centroids = centroids, nProbe = 3)
      val inline = Similarity.ivfKnn(emb, queries,
        "vec_id", "embedding", k = 5, centroids = centroids, nProbe = 3)
      // bit-identical neighbors through the persisted path
      assert(run(probe) == run(inline))
      val ps = probe.queryExecution.executedPlan.toString
      // the ONLY hash shuffle is the final top-k window on query_id —
      // the index side joins via the broadcast query side, unshuffled
      val shuffles = "Exchange hashpartitioning".r.findAllIn(ps).toSeq
      assert(shuffles.size == 1, s"expected only the top-k window shuffle:\n$ps")
      // the literal probe-cell filter prunes non-probed buckets in-scan
      val pruned = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(ps)
      assert(pruned.isDefined, s"no bucket pruning in scan:\n$ps")
      assert(pruned.get.group(1).toInt < pruned.get.group(2).toInt,
        s"probe should not read every bucket: ${pruned.get.matched}")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_idx_spec")
  }

  test("persisted dedup index: probe equals inline incrementalDedup; index tables never shuffle") {
    val docs = Tables(spark, sf0001).documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    Dedup.writeDedupIndex(corpus, "doc_id", "text", "dedup_idx_spec", numBuckets = 8)
    try {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      val probe = Dedup.incrementalDedupIndexed(
        spark, "dedup_idx_spec", batch, "doc_id", "text")
      val inline = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      assert(canon(probe) == canon(inline))
      // index rows are never a shuffle's payload: between any index-table
      // scan and its nearest JOIN ancestor there must be no
      // ShuffleExchange (a shuffle above the join moves the join's
      // batch-sized output, which is fine; a shuffle directly over the
      // scan would repartition the index itself)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val offenders = Seq.newBuilder[String]
      def walk(p: SparkPlan, shuffledSinceJoin: Boolean): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.initialPlan, shuffledSinceJoin)
        case q: QueryStageExec => walk(q.plan, shuffledSinceJoin)
        case s: FileSourceScanExec
            if s.toString.contains("dedup_idx_spec") && shuffledSinceJoin =>
          offenders += s.nodeName
        case _ =>
          val state = p match {
            case _: ShuffleExchangeExec => true
            case _: BaseJoinExec => false
            case _ => shuffledSinceJoin
          }
          p.children.foreach(walk(_, state))
          p.subqueries.foreach(walk(_, false))
      }
      walk(probe.queryExecution.executedPlan, shuffledSinceJoin = false)
      assert(offenders.result().isEmpty,
        s"index table scan shuffled before its join: ${offenders.result()}")
    } finally Seq("_exact", "_bands", "_texts").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS dedup_idx_spec$s"))
  }

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
