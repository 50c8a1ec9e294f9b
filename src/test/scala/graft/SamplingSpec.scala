package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sampling}

/** Deterministic sampling surface: the epoch shuffle (shuffleShards) and
  * DSIR importance resampling. Value-level verification is the driver's
  * DuckDB gate (p13/p14); here we pin the algebraic invariants. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  // ---------------- shuffleShards ----------------

  private def ids = (0L until 100L).toDF("id")

  test("shuffleShards: a permutation — every id once, pos dense per shard") {
    val out = Sampling.shuffleShards(ids, "id", nShards = 8).collect()
    assert(out.map(_.getAs[Long]("id")).sorted.toSeq == (0L until 100L))
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ==
        (1L to rows.length))
    }
  }

  test("shuffleShards: pure function of (id, seed) — repartition-stable") {
    def key(df: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShards(df, "id", nShards = 8).collect()
        .map(r => (r.getAs[Long]("id"),
          (r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    assert(key(ids) == key(ids.repartition(7)))
  }

  test("shuffleShards: pos is the (hash, id) rank within the shard") {
    val expected = ids
      .select(col("id"), xxhash64(col("id"), lit(42L)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (id, h) => Math.floorMod(h, 8L) }
      .view.mapValues(_.sortBy { case (id, h) => (h, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) })
      .toMap
    val got = Sampling.shuffleShards(ids, "id", nShards = 8).collect()
    got.foreach { r =>
      val (id, shard, pos) = (r.getAs[Long]("id"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos"))
      assert(expected(shard).toMap.apply(id) == pos, s"id $id")
    }
  }

  test("shuffleShards: a different seed is a different permutation") {
    def perm(seed: Long) =
      Sampling.shuffleShards(ids, "id", nShards = 8, seed = seed).collect()
        .map(r => (r.getAs[Long]("id"),
          (r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    assert(perm(42L) != perm(43L))
  }

  test("shuffleShards: rejects nShards = 0") {
    intercept[IllegalArgumentException](
      Sampling.shuffleShards(ids, "id", nShards = 0))
  }

  // ---------------- DSIR ----------------

  private def corpus = Seq(
    (1L, "alpha beta alpha beta alpha"),
    (2L, "alpha beta gamma delta"),
    (3L, "gamma delta gamma delta gamma"),
    (4L, "one"), // single token: zero bigrams
    (5L, "")
  ).toDF("doc_id", "text")

  test("dsir: target == raw makes every log-ratio, hence weight, zero") {
    val out = Dsir.importanceWeights(corpus, corpus, "doc_id", "text")
      .collect()
    assert(out.forall(_.getAs[Double]("weight") == 0.0))
  }

  test("dsir: zero-bigram documents get weight 0 and n_bigrams 0") {
    val target = corpus.filter(col("doc_id") === 1L)
    val out = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("weight"))).toMap
    assert(out(4L) == (0L, 0.0) && out(5L) == (0L, 0.0))
  }

  test("dsir: weights rank target-like documents above disjoint ones") {
    val target = corpus.filter(col("doc_id") === 1L) // alpha/beta world
    val out = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L),
      s"expected alpha-heavy > mixed > gamma-heavy, got $out")
    assert(out(3L) < 0, "disjoint doc should score negative")
  }

  test("dsir: repartition-stable and model-reuse equal to fresh learn") {
    val target = corpus.filter(col("doc_id") <= 2L)
    val fresh = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val model = Dsir.learnLogRatios(corpus, target, "text")
    val reused = Dsir.importanceWeights(
      corpus.repartition(5), target, "doc_id", "text",
      model = Some(model)).orderBy("doc_id").collect().toSeq
    assert(fresh == reused)
  }

  test("dsir: model length must match buckets") {
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(corpus, corpus, "doc_id", "text",
        buckets = 128, model = Some(Array(1L))))
  }
}
