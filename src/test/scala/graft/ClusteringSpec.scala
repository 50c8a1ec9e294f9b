package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Quantized k-means semantics ([[graft.operators.Clustering]]). */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  // two tight groups around (0,0) and (10,10), plus one outlier pair
  lazy val vecs = Seq(
    (0L, Seq(0.01f, 0.02f)), (1L, Seq(10.0f, 10.0f)),
    (2L, Seq(0.03f, 0.01f)), (3L, Seq(10.1f, 9.9f)),
    (4L, Seq(0.02f, 0.00f)), (5L, Seq(9.9f, 10.2f))
  ).toDF("vec_id", "embedding")

  test("separated groups are recovered from the lowest-id seeds") {
    val got = Clustering.kmeansQuantized(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").select("cluster").as[Int].collect().toSeq
    assert(got == Seq(0, 1, 0, 1, 0, 1))
  }

  test("assignments are bit-identical under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeansQuantized(df, "vec_id", "embedding", k = 2, iters = 2)
        .orderBy("vec_id").as[(Long, Int, Long)].collect().toSeq
    assert(run(vecs) == run(vecs.repartition(5)))
  }

  test("iterating does not increase total within-cluster distance") {
    def total(iters: Int): Long =
      Clustering.kmeansQuantized(vecs, "vec_id", "embedding", k = 2, iters = iters)
        .agg(sum(col("dist"))).as[Long].head()
    assert(total(2) <= total(1))
    assert(total(1) <= total(0))
  }

  test("an emptied cluster keeps its centroid instead of vanishing") {
    // seeds 0 and 1; every point is nearest group-0 after one update,
    // but k=2 must still produce two centroid rows (cluster 1 retained)
    val lopsided = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.2f, 0.2f)),
      (2L, Seq(0.01f, 0.01f)), (3L, Seq(0.02f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeansQuantized(lopsided, "vec_id", "embedding", k = 2, iters = 3)
      .select("cluster").distinct().as[Int].collect().toSeq.sorted
    // no exception, and assignments only reference live clusters
    assert(got.forall(c => c == 0 || c == 1))
  }

  test("no scale antipattern errors in the iterated plan") {
    graft.plans.PlanAudit.assertScalable(
      Clustering.kmeansQuantized(vecs, "vec_id", "embedding", k = 2, iters = 2))
  }

  // near-parallel vectors within each group; cross-group cosines are low
  lazy val semVecs = Seq(
    (0L, Seq(1.0f, 0.01f)), (1L, Seq(0.01f, 1.0f)),
    (2L, Seq(2.0f, 0.03f)), (3L, Seq(0.02f, 3.0f)),
    (4L, Seq(1.5f, 0.01f)), (5L, Seq(0.0f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("semDedup keeps the lowest id of each semantic group") {
    val got = Clustering
      .semDedup(semVecs, "vec_id", "embedding", k = 2, iters = 2, tau = 0.99)
      .orderBy("vec_id")
      .select("vec_id", "dup_of", "is_dup")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    // group {0,2,4} (x-axis) and {1,3,5} (y-axis): 0 and 1 survive,
    // every later member points at the smallest cluster-mate above tau
    assert(got == Seq(
      (0L, None, false), (1L, None, false),
      (2L, Some(0L), true), (3L, Some(1L), true),
      (4L, Some(0L), true), (5L, Some(1L), true)))
  }

  test("semDedup marks nothing at an impossible threshold") {
    val got = Clustering
      .semDedup(semVecs, "vec_id", "embedding", k = 2, iters = 2, tau = 1.1)
      .filter(col("is_dup")).count()
    assert(got == 0L)
  }

  test("semDedup is bit-identical under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.semDedup(df, "vec_id", "embedding", k = 2, iters = 2, tau = 0.99)
        .orderBy("vec_id").as[(Long, Int, Option[Long], Boolean)].collect().toSeq
    assert(run(semVecs) == run(semVecs.repartition(5)))
  }

  test("no scale antipattern errors in the semDedup plan") {
    graft.plans.PlanAudit.assertScalable(
      Clustering.semDedup(semVecs, "vec_id", "embedding", k = 2, iters = 2, tau = 0.5))
  }
}
