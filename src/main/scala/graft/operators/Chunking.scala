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
}
