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
}
