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

  test("spanCorrupt: reconstruction invariants, sentinel numbering, zero shuffle, determinism") {
    val docs = Tables(spark, sf0001).documents
    val out = Chunking.spanCorrupt(docs, "doc_id", "text")
    // scan-local: the OPERATOR adds no exchange. The input may carry the
    // round-15 scan fan-out (an explicitly requested REPARTITION_BY_NUM
    // on the small test files); any other exchange is the operator's.
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    val fanOuts = "REPARTITION_BY_NUM".r.findAllIn(plan).length
    assert(exchanges == fanOuts, plan.take(2000))
    val rows = out.collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3), r.getInt(4))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    var masked = 0L
    var total = 0L
    texts.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val (inp, tgt, nSpans, nMasked) = rows(id)
      val inpToks = inp.split(" ").filter(_.nonEmpty).toSeq
      val tgtToks = tgt.split(" ").filter(_.nonEmpty).toSeq
      // sentinels number 0..n_spans-1 in order, once in each string
      def sentinels(ts: Seq[String]) =
        ts.collect { case sentinel(k) => k.toInt }
      assert(sentinels(inpToks) == (0 until nSpans))
      assert(sentinels(tgtToks) == (0 until nSpans))
      // splice the target spans back into the input: recovers the doc
      val spans = tgtToks.foldLeft(Vector.empty[Vector[String]]) { (acc, t) =>
        if (sentinel.matches(t)) acc :+ Vector()
        else acc.init :+ (acc.last :+ t)
      }
      val rebuilt = inpToks.flatMap {
        case sentinel(k) => spans(k.toInt)
        case t => Seq(t)
      }
      assert(rebuilt == toks, s"doc $id failed reconstruction")
      assert(nMasked == spans.map(_.size).sum)
      masked += nMasked
      total += toks.size
    }
    // ~15% expected corruption (3/20); generous band for a finite corpus
    val rate = masked.toDouble / total.toDouble
    assert(rate > 0.05 && rate < 0.30, s"corruption rate $rate out of band")
    // pure function of (id, text): repartitioning changes nothing
    val again = Chunking.spanCorrupt(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3), r.getInt(4))).toMap
    assert(again == rows)
  }
}
