package graft

import org.apache.spark.sql.functions._

import graft.operators.Scoring

/** Hashed linear scorer: determinism and edge semantics. */
class ScoringSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "big fast join join merge"),
    (2L, ""),
    (3L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
  ).toDF("doc_id", "text")

  test("empty documents score sigmoid(0) = 0.5; probs stay in (0,1)") {
    val out = Scoring.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(1).getLong(1) == 0L && out(1).getDouble(2) == 0.5)
    assert(out.forall(r => r.getDouble(2) > 0 && r.getDouble(2) < 1))
  }

  test("bit-identical under repartitioning") {
    val a = Scoring.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Scoring.hashedLinearScore(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("dim must be a power of two (unsigned-mod/pmod agreement)") {
    intercept[IllegalArgumentException](
      Scoring.hashedLinearScore(docs, "doc_id", "text", dim = 60))
  }
}
