package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based document scoring: a hashed bag-of-words linear
  * classifier (the fastText/CCNet-style quality filter) evaluated as
  * pure Spark expressions.
  *
  * The hashing trick maps each token to one of `dim` buckets via
  * `pmod(xxhash64(token), dim)`; the document logit is the sum of
  * bucket weights over the document's tokens, averaged over document
  * length, squashed by a sigmoid. At 100 TB this is the shape that
  * matters: no vocabulary table, no model join, and NO SHUFFLE AT ALL —
  * scoring is a pure projection (tokenize → bucket → sorted fold) that
  * fuses into the scan and therefore also runs UNCHANGED in Structured
  * Streaming (a stateless select; see StreamingSpec).
  *
  * Determinism contract (the same one as unigramLmScore): the per-row
  * fold runs over the SORTED bucket array, so every double addition
  * happens in one documented order — scores are bit-stable under any
  * partitioning and replay exactly in DuckDB via the xxhash64
  * emulation. `dim` must be a power of two so unsigned-mod (DuckDB
  * HUGEINT) and pmod (Spark signed) agree.
  */
object Scoring {

  /** Default pseudo-weights: w(b) = ((b*37 + 11) mod 101 - 50) / 100 —
    * integer arithmetic then one double division, exact cross-engine.
    * Swap in `b => element_at(lit(trained), b + 1)` for a real model. */
  def defaultWeights(bucket: Column): Column =
    ((bucket * 37 + 11) % 101 - 50).cast("double") / 100.0

  /** (idCol, dl, quality_prob): sigmoid of the mean hashed-bag logit.
    * Empty documents score sigmoid(0) = 0.5. */
  def hashedLinearScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64,
      weightOf: Column => Column = defaultWeights): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two; got $dim")
    docs
      .select(
        col(idCol),
        array_sort(transform(
          TextFunctions.tokens(lower(col(textCol))),
          t => pmod(xxhash64(t), lit(dim.toLong)))).as("__bs"))
      .select(
        col(idCol),
        size(col("__bs")).cast("long").as("dl"),
        aggregate(col("__bs"), lit(0.0), (acc, b) => acc + weightOf(b)).as("__s"))
      .select(col(idCol), col("dl"),
        round(lit(1.0) / (lit(1.0) +
          exp(-when(col("dl") === 0, lit(0.0))
            .otherwise(col("__s") / col("dl").cast("double")))), 6)
          .as("quality_prob"))
  }
}
