package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-window chunking: split each document into overlapping
  * token windows (size `window`, stride `stride` < window ⇒ overlap
  * `window - stride`) — the standard preparation for retrieval indexes
  * and fixed-context training examples.
  *
  * Purely scan-local: tokenization, the start-offset generator
  * (`posexplode(sequence(...))`) and the window slice all run inside the
  * document's scan task — no shuffle, no state; output order within a
  * document is the deterministic `chunk_id`. At 100 TB the operator's
  * cost is the scan plus an output ~`window/stride` × input tokens;
  * downstream dedup/indexing keys on (doc_id, chunk_id).
  */
object Chunking {

  /** One row per (document, window): `chunk_id` (0-based window
    * ordinal), `n_tokens` (window may be short at the tail), and the
    * re-joined `chunk_text`. Start offsets step by `stride`; every
    * token lands in at least one window and consecutive windows share
    * `window - stride` tokens. */
  def overlappingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(
        col(idCol),
        col("__toks"),
        posexplode(
          sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(
        col(idCol),
        col("chunk_id"),
        slice(col("__toks"), col("__start") + 1, lit(window)).as("__w"))
      .filter(size(col("__w")) > 0)
      .select(
        col(idCol),
        col("chunk_id"),
        size(col("__w")).as("n_tokens"),
        array_join(col("__w"), " ").as("chunk_text"))
  }

  /** T5/UL2-style SPAN CORRUPTION example preparation (Raffel et al.
    * 2020): mask token spans and emit the (input-with-sentinels,
    * target-spans) pair a denoising pretraining objective consumes.
    *
    * Deterministic, position-local spec (reproducible across runs,
    * partitionings, and the DuckDB oracle — no RNG state): token
    * position p STARTS a span iff `pmod(xxhash64(doc_id, p), startMod)
    * = 0`; a position is MASKED iff some start falls in its trailing
    * `spanLen` window; consecutive masked positions merge into one
    * span (islands), numbered left to right. The input keeps unmasked
    * tokens and one `<extra_id_k>` sentinel per island; the target is
    * each sentinel followed by its masked tokens. Expected corruption
    * ~= spanLen/startMod of tokens (default 3/20 = 15%, the T5
    * setting).
    *
    * Scale shape: ZERO shuffle — tokenization, the hash decisions, the
    * island merge and both reassemblies run as ONE native codegen'd
    * kernel sweep per document inside the scan
    * ([[graft.functions.expressions.SpanCorruptOps]] — O(tokens); an
    * earlier higher-order-function fold paid O(tokens²) array copies
    * and, because lambda-bearing expressions are skipped by codegen
    * subexpression elimination, was re-evaluated once per output
    * field: 16.6 s → 0.64 s at sf0.1). Output: (idCol, input_text,
    * target_text, n_spans, n_masked_tokens); empty docs yield empty
    * strings and zeros. */
  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      textCol: String,
      startMod: Int = 20,
      spanLen: Int = 3): DataFrame =
    df
      .select(col(idCol), graft.functions.expressions.SpanCorruptOps
        .spanCorrupt(col(idCol).cast("long"),
          TextFunctions.tokens(col(textCol)), startMod, spanLen).as("__f"))
      .select(
        col(idCol),
        col("__f.input_text").as("input_text"),
        col("__f.target_text").as("target_text"),
        col("__f.n_spans").as("n_spans"),
        col("__f.n_masked_tokens").as("n_masked_tokens"))
}
