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
    * island merge and both reassemblies are one left fold over the
    * token array (struct-accumulator `aggregate`, inside the scan),
    * the same in-scan sequential-fold discipline as the BPE merge
    * pass. Output: (idCol, input_text, target_text, n_spans,
    * n_masked_tokens); empty docs yield empty strings and zeros. */
  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      textCol: String,
      startMod: Int = 20,
      spanLen: Int = 3): DataFrame = {
    require(startMod >= 1 && spanLen >= 1,
      s"need startMod >= 1 and spanLen >= 1, got $startMod, $spanLen")
    val withMask = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .withColumn("__starts",
        transform(col("__ts"), (_, i) =>
          pmod(xxhash64(col(idCol).cast("long"), i.cast("long")),
            lit(startMod.toLong)) === 0))
      .withColumn("__masked",
        transform(col("__ts"), (_, i) =>
          aggregate(
            sequence(greatest(i - (spanLen - 1), lit(0)), i),
            lit(false),
            (a, s) => a || element_at(col("__starts"), s + 1))))
    val zipped = transform(col("__ts"), (x, i) =>
      struct(x.as("tok"), element_at(col("__masked"), i + 1).as("m")))
    val folded = aggregate(
      zipped,
      struct(
        array().cast("array<string>").as("inp"),
        array().cast("array<string>").as("tgt"),
        lit(false).as("in_span"),
        lit(-1).as("k")),
      (acc, t) => {
        val tok = t.getField("tok")
        val m = t.getField("m")
        val opens = m && !acc.getField("in_span")
        val newK = when(opens, acc.getField("k") + 1).otherwise(acc.getField("k"))
        val sentinel = concat(lit("<extra_id_"), newK.cast("string"), lit(">"))
        struct(
          when(!m, concat(acc.getField("inp"), array(tok)))
            .when(opens, concat(acc.getField("inp"), array(sentinel)))
            .otherwise(acc.getField("inp")).as("inp"),
          when(opens, concat(acc.getField("tgt"), array(sentinel, tok)))
            .when(m, concat(acc.getField("tgt"), array(tok)))
            .otherwise(acc.getField("tgt")).as("tgt"),
          m.as("in_span"),
          newK.as("k"))
      })
    withMask
      .withColumn("__f", folded)
      .select(
        col(idCol),
        concat_ws(" ", col("__f.inp")).as("input_text"),
        concat_ws(" ", col("__f.tgt")).as("target_text"),
        (col("__f.k") + 1).as("n_spans"),
        size(filter(col("__masked"), m => m)).as("n_masked_tokens"))
  }
}
