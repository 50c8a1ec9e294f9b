package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.BottomK

/** Ground truth for the bottom-k consistent sample: equality with the
  * sort-by-hash formulation, invariance under partitioning and merge
  * order, the consistency-under-growth property, and bounded state. */
class BottomKSpec extends SparkSpec {

  import spark.implicits._

  private def hashOf(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, 42L)

  test("sample equals the k smallest hashes, in hash order") {
    val vals = (1L to 1000L).map(_ * 2654435761L)
    val got = vals.toDF("v").agg(BottomK(col("v"), 16)).head.getSeq[Long](0)
    val want = vals.sortBy(v => hashOf(v) ^ Long.MinValue).take(16)
    assert(got.toSeq == want)
  }

  test("identical under any partitioning and input order") {
    val vals = (1L to 5000L).map(_ * 40503L)
    def sample(parts: Int, rev: Boolean) = {
      val in = if (rev) vals.reverse else vals
      in.toDF("v").repartition(parts).agg(BottomK(col("v"), 32)).head.getSeq[Long](0)
    }
    val a = sample(1, rev = false)
    assert(a == sample(13, rev = false) && a == sample(7, rev = true))
  }

  test("consistent under growth: adding data only evicts, never reshuffles") {
    val base = (1L to 2000L)
    val grown = (1L to 3000L)
    val sBase = base.toDF("v").agg(BottomK(col("v"), 64)).head.getSeq[Long](0).toSet
    val sGrown = grown.toDF("v").agg(BottomK(col("v"), 64)).head.getSeq[Long](0).toSet
    // every sampled id dropped between snapshots must be due to eviction
    // by a smaller new hash — the overlap stays large (here: >= half)
    assert((sBase & sGrown).size * 2 >= 64, s"overlap ${(sBase & sGrown).size}")
    // and samples drawn from the SAME data at different k nest
    val s16 = base.toDF("v").agg(BottomK(col("v"), 16)).head.getSeq[Long](0)
    val s64 = base.toDF("v").agg(BottomK(col("v"), 64)).head.getSeq[Long](0)
    assert(s64.take(16) == s16)
  }

  test("groups smaller than k return everything; nulls are ignored") {
    val df = Seq((1L, Some(10L)), (1L, Some(11L)), (1L, None), (2L, Some(20L)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(BottomK(col("v"), 5).as("s"))
      .orderBy("g").collect()
    assert(got(0).getSeq[Long](1).toSet == Set(10L, 11L))
    assert(got(1).getSeq[Long](1) == Seq(20L))
  }
}
