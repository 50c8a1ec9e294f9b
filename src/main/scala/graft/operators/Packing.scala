package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate documents in a deterministic
  * order, cut the token stream into fixed-length context windows" op
  * that turns a cleaned corpus into training sequences (the GPT-style
  * packed-pretraining layout; same concat-then-chunk semantics as
  * Brown et al. 2020's input pipeline).
  *
  * The cumulative token offset of every document comes from the
  * distributed prefix-sum operator ([[graft.plans.PrefixSumExec]] via
  * `Frame.withPrefixSum`) — a range-partitioned parallel sort plus an
  * O(#partitions) offsets job — NOT a single-task global window, so the
  * pack assignment scales to a 100 TB corpus. Everything downstream of
  * the offset is per-row arithmetic fused into the scan.
  */
object Packing {

  /** SFT / chat-data assembly: flatten per-key event streams into
    * role-tagged conversation TURNS with token offsets — the structure
    * an instruction-tuning tokenizer consumes to build (input_ids,
    * loss_mask) pairs. Each key's rows order by `order` (must be
    * total), alternate user/assistant roles from "user", render as
    * `<|role|> content`, and get [tok_start, tok_end) whitespace-token
    * offsets within their conversation via a per-key running sum (the
    * role marker is token tok_start; content spans [tok_start+1,
    * tok_end)). `loss` marks assistant turns — the spans a
    * cross-entropy mask keeps. Offsets make the downstream tokenizer
    * embarrassingly parallel: every turn knows its position without
    * re-scanning the conversation.
    *
    * Scale shape: ONE key-partitioned window (rank + running sum in
    * the same frame) — conversations are user-sized, never
    * corpus-sized; no join, no global sort. Content is the caller's
    * expression, so any event→text rendering composes in-scan. */
  def chatTurns(
      events: DataFrame,
      keyCol: String,
      order: Seq[Column],
      contentExpr: Column): DataFrame = {
    require(order.nonEmpty, "order must be a total order within the key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
    val base = events.select(
      col(keyCol),
      contentExpr.as("content"),
      row_number().over(w).as("turn_idx"))
    val ntok = lit(1L) +
      graft.functions.TextFunctions.tokenCount(col("content")).cast("long")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("turn_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base
      .withColumn("role",
        when(col("turn_idx") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      .withColumn("__ntok", ntok)
      .withColumn("tok_start", coalesce(sum(col("__ntok")).over(w2), lit(0L)))
      .select(col(keyCol), col("turn_idx"), col("role"),
        concat(lit("<|"), col("role"), lit("|> "), col("content")).as("rendered"),
        col("tok_start"),
        (col("tok_start") + col("__ntok")).as("tok_end"),
        (col("role") === "assistant").as("loss"))
  }

  /** Assign each document its position in the packed token stream:
    *   - `pack_id`     — context window containing the doc's FIRST token
    *   - `pack_offset` — token offset of the doc within that window
    *   - `end_pack`    — window containing the doc's LAST token
    *     (> pack_id means the doc straddles window boundaries — the
    *     concat-and-chunk contract splits it)
    *
    * `order` must be a total order (tie-free) for a deterministic
    * packing; `tokenCol` must be a non-negative integral column with at
    * least 1 token per doc. */
  def packSequences(
      docs: DataFrame,
      tokenCol: String,
      seqLen: Int,
      order: Seq[Column]): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    graft.Frame
      .withPrefixSum(docs, order, col(tokenCol).cast("long"), "__idx", "__off")
      .withColumn("pack_id", expr(s"__off div $seqLen"))
      .withColumn("pack_offset", expr(s"__off % $seqLen"))
      .withColumn("end_pack", expr(s"(__off + $tokenCol - 1) div $seqLen"))
      .drop("__idx", "__off")
  }

  /** MATERIALIZE the packed training sequences [[packSequences]] only
    * addresses: tokenize every document with the merge table
    * ([[graft.functions.expressions.BpeEncodeTokens]] per pretoken,
    * flattened in-scan), concatenate the per-document token streams in
    * `idCol` order, and cut the global stream into `seqLen`-token
    * context windows. Output one row per TOKEN — (seq_id, seq_pos,
    * token, idCol provenance) — the exploded shard-writer layout a
    * trainer's loader groups by seq_id.
    *
    * Scale shape: ONE corpus scan (the token array is built by scan-
    * local expressions and rides the prefix-sum's range-partitioned
    * sort exactly once — payload the same order as the text itself);
    * the global token offset comes from the distributed prefix sum
    * (never a single-task window); everything after the offset is
    * per-row arithmetic in the generator's projection. Documents with
    * no pretokens contribute nothing, exactly like the concat contract.
    * Window boundaries split documents mid-stream by construction —
    * pack_id/end_pack of [[packSequences]] agree with the first/last
    * token's seq_id here (the two faces share the prefix-sum offsets). */
  /** Length-grouped batch assembly — the padded-batching counterpart
    * of [[packSequences]]: when training/inference consumes PADDED
    * batches (SFT, reward models, encoders — anything that can't
    * concatenate across examples), batching similar-length documents
    * together is what keeps the pad-token fraction low (HuggingFace's
    * `group_by_length`; bucketing in Tensor2Tensor). Documents sort by
    * (length, id) — a strict total order, so assignment is
    * deterministic — and consecutive runs of `batchSize` docs form a
    * batch; each batch pads to its own max.
    *
    * Returns one row per document: (id, n_tokens, batch_id) — the
    * assignment a loader consumes. Aggregate per batch for the
    * padding audit (p33 does; `pad_waste = n·max − Σlen`).
    *
    * Scale shape: the global order comes from
    * [[graft.plans.RowIndexExec]] (range-partitioned parallel sort +
    * per-partition offsets), NEVER a single-task `row_number()`
    * window; everything after the index is per-row arithmetic. One
    * sort shuffle total — same cost class as the packing path. */
  def lengthGroupedBatches(
      docs: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    graft.Frame
      .withRowIndex(
        docs.select(col(idCol), col(lenCol).cast("long").as("n_tokens")),
        Seq(col("n_tokens"), col(idCol)), "__idx")
      .select(col(idCol), col("n_tokens"),
        expr(s"__idx div $batchSize").as("batch_id"))
  }

  def packTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val toks = docs
      // empty-document filter on the RAW text, not on size(__toks)
      // (round 16): a tokenize-derived predicate gets pushed below any
      // upstream exchange and re-runs the whole regexp + BPE encode at
      // SCAN width just to test emptiness — measured 7 s on 2 tasks at
      // sf1, 60% of p12. Exact equivalence: the BPE pretoken regex's
      // alternation covers letters, digits, whitespace, and
      // everything-else, so every non-empty string yields >= 1
      // pretoken, and bpeEncode of a non-empty pretoken yields >= 1
      // symbol — size(__toks) > 0 <=> text non-null and non-empty.
      .filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(
        col(idCol),
        flatten(
          transform(
            graft.functions.TextFunctions.bpeTokens(col(textCol)),
            pt => graft.functions.expressions.BpeOps.bpeEncode(pt, merges)))
          .as("__toks"))
    graft.Frame
      .withPrefixSum(toks, Seq(col(idCol)), size(col("__toks")).cast("long"),
        "__idx", "__off")
      .select(col(idCol), col("__off"),
        posexplode(col("__toks")).as(Seq("__p", "token")))
      .withColumn("__gpos", col("__off") + col("__p"))
      .select(
        expr(s"__gpos div $seqLen").as("seq_id"),
        (col("__gpos") % seqLen).as("seq_pos"),
        col("token"),
        col(idCol))
  }
}
