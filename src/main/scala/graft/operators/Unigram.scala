package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.expressions.UnigramOps
import graft.functions.expressions.UnigramOps.Params

/** Distributed UNIGRAM-LM tokenizer training and counting (Kudo 2018 /
  * SentencePiece, the deterministic Viterbi-EM variant specified in
  * [[graft.functions.expressions.UnigramOps]]) — the second learned
  * subword family next to [[Bpe]]. Where BPE's model is a merge
  * HISTORY, unigram's is a piece PROBABILITY TABLE, and tokenization is
  * maximum-likelihood Viterbi segmentation — the model production
  * multilingual pipelines train when they need sampling-capable or
  * lattice tokenization.
  *
  * Scale shape (the [[Bpe.learnMerges]] contract): the corpus is read
  * ONCE — the pretoken-count aggregation — and cached as a vocabulary-
  * sized relation; every training step after that runs on it, never on
  * raw text. Per EM round: ONE keyed aggregation (explode the Viterbi
  * pieces of each distinct pretoken, sum pretoken counts per piece —
  * map-side combine first) whose result is VOCABULARY-sized and lands
  * on the driver, where the M-step is O(|vocab|) arithmetic. The seed
  * round is the same shape over candidate slices, with the multi-piece
  * cap a `TakeOrderedAndProject` (per-partition heaps — the full
  * substring relation never collects). Segmentation itself is a native
  * codegen'd expression (no UDF), O(maxPieceLen x |pretoken|) per
  * DISTINCT pretoken.
  *
  * Round count is `emIters + 1` TOTAL Spark jobs over the cached
  * relation — unigram training is not merge-sequential like BPE, so
  * there is no jobs-per-vocabulary-unit wall at all: a 32k-piece
  * vocabulary trains in the same handful of rounds as a 1k-piece one
  * (the EM round count is a convergence knob, not a vocabulary knob).
  */
object Unigram {

  /** LEARN a piece vocabulary from a corpus: (piece, quantized log-prob
    * score), sorted by piece in code-point order. Spec-pinned equal to
    * the sequential twin [[UnigramOps.trainLocal]] (UnigramSpec; the
    * t25/t26 oracles gate it against the twin at corpus scale). */
  def learnVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      params: Params = Params()): Seq[(String, Long)] = {
    val pre = docs
      .select(explode(TextFunctions.bpeTokens(col(textCol))).as("__pt"))
      .groupBy(col("__pt"))
      .agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ---- seed: weighted candidate-slice counts ----
      val subs = pre
        .select(
          explode(
            UnigramOps.unigramCandidates(col("__pt"), params.maxPieceLen))
            .as("__p"),
          col("__n"))
        .groupBy(col("__p"))
        .agg(sum(col("__n")).as("__c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (singles, multi) =
        try {
          // alphabet-sized: every single code point, kept unconditionally
          val s = subs.filter(length(col("__p")) === 1)
            .collect().map(r => r.getString(0) -> r.getLong(1))
          // the multi-piece cap: TakeOrderedAndProject, never a full sort
          val m = subs
            .filter(length(col("__p")) > 1 && col("__c") >= params.minCount)
            .orderBy((col("__c") * length(col("__p"))).desc, col("__p").asc)
            .limit(params.seedSize)
            .collect().map(r => r.getString(0) -> r.getLong(1))
          (s, m)
        } finally { subs.unpersist(); () }
      if (singles.isEmpty) return Seq.empty
      val singleSet = singles.map(_._1).toSet
      var state: Map[String, Long] = (singles ++ multi).toMap

      // ---- EM rounds: one keyed usage aggregation each ----
      for (_ <- 0 until params.emIters) {
        val vocab = UnigramOps.scoredVocab(state)
        val usage = pre
          .select(
            explode(UnigramOps.unigramPieces(col("__pt"), vocab)).as("__p"),
            col("__n"))
          .groupBy(col("__p"))
          .agg(sum(col("__n")).as("__u"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        state = UnigramOps.mStep(state.keySet, singleSet, usage)
      }
      UnigramOps.scoredVocab(
        UnigramOps.prune(state, singleSet, params.vocabSize))
    } finally { pre.unpersist(); () }
  }

  /** Persist a learned vocabulary as a tiny (piece, logp_q) parquet
    * relation — the tokenizer ARTIFACT a learn-once job publishes for
    * every downstream consumer (the [[Bpe.writeMerges]] contract for
    * the second subword family). */
  def writeVocab(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[(String, Long)],
      path: String): Unit = {
    UnigramOps.table(vocab) // fail fast before publishing
    import spark.implicits._
    vocab.toDF("piece", "logp_q")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeVocab]] artifact, restoring the canonical code-point
    * piece order and re-validating (duplicate or empty pieces fail HERE,
    * at load, not mid-pipeline inside a tokenize job). Feeds
    * [[tokenCounts]] / [[UnigramOps.unigramPieces]] directly. */
  def readVocab(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long)] = {
    val loaded = spark.read.parquet(path)
      .select(col("piece"), col("logp_q").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
      .sortBy(_._1)(graft.functions.expressions.BpeOps.codePointOrdering)
    UnigramOps.table(loaded) // fail fast on a corrupted artifact
    loaded
  }

  /** Per-document Viterbi token counts under a learned vocabulary:
    * (idCol, n_unigram_tokens) — the [[Bpe.tokenCounts]] shape
    * verbatim: ONE corpus scan, no join; pretokenize + `explode_outer`
    * in-scan (empty docs keep a null-pretoken row and count 0),
    * aggregate (doc, pretoken) occurrence counts behind a map-side
    * combine, run the DP once per aggregated row, sum per doc. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    UnigramOps.table(vocab) // fail fast on a malformed vocabulary
    docs
      .select(col(idCol),
        explode_outer(TextFunctions.bpeTokens(col(textCol))).as("__pt"))
      .groupBy(col(idCol), col("__pt"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(
        when(col("__pt").isNotNull,
          col("__n") * UnigramOps.unigramTokenCount(col("__pt"), vocab))
          .otherwise(lit(0L))).as("n_unigram_tokens"))
  }
}
