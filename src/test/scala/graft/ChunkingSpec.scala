package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

/** Overlapping-window chunking semantics ([[graft.operators.Chunking]]). */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (0 until n).map(i => s"t$i").mkString(" "))).toDF("id", "text")

  test("windows step by stride, overlap by window - stride, tail may be short") {
    val got = Chunking.overlappingChunks(doc(25), "id", "text", window = 10, stride = 7)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(got.map(_._1) == Seq(0, 1, 2, 3))
    assert(got.map(_._2) == Seq(10, 10, 10, 4)) // starts 0,7,14,21 over 25 tokens
    assert(got(0)._3.startsWith("t0 t1") && got(1)._3.startsWith("t7 t8"))
    // consecutive windows share window - stride = 3 tokens
    val w0 = got(0)._3.split(" ").toSet
    val w1 = got(1)._3.split(" ").toSet
    assert(w0.intersect(w1) == Set("t7", "t8", "t9"))
  }

  test("every token is covered by at least one window") {
    val n = 53
    val covered = Chunking.overlappingChunks(doc(n), "id", "text", 16, 11)
      .select(explode(split(col("chunk_text"), " ")).as("t"))
      .distinct().count()
    assert(covered == n)
  }

  test("stride == window gives disjoint exact partitioning") {
    val got = Chunking.overlappingChunks(doc(20), "id", "text", 5, 5)
      .agg(sum(col("n_tokens")), count(lit(1))).as[(Long, Long)].head()
    assert(got == ((20L, 4L)))
  }

  test("chunking is scan-local: no exchange in the plan") {
    val plan = Chunking.overlappingChunks(doc(25), "id", "text", 10, 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
