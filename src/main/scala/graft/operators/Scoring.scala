package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based document scoring: a hashed bag-of-words linear
  * classifier (the fastText/CCNet-style quality filter) evaluated as
  * pure Spark expressions.
  *
  * The hashing trick maps each token to one of `dim` buckets via
  * `pmod(xxhash64(token), dim)`; the document logit is the
  * weight-vector dot product with the bucket-count vector, averaged
  * over document length, squashed by a sigmoid. At 100 TB this is the
  * shape that matters: no vocabulary table, no model join — weights
  * enter the plan as a closed-form expression (or a broadcast literal
  * array for a trained model), and scoring fuses into the scan's
  * codegen up to one (doc, bucket) count aggregation.
  *
  * Determinism contract (the same one as unigramLmScore): bucket
  * counts are exact longs; the per-document reduction folds
  * (bucket-sorted, fixed seed) so every double addition happens in one
  * documented order — scores are bit-stable under any partitioning and
  * replay exactly in DuckDB via the xxhash64 emulation. `dim` must be a
  * power of two so unsigned-mod (DuckDB HUGEINT) and pmod (Spark
  * signed) agree.
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
    val toks = docs.select(
      col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("__ts"))
    val base = toks.select(col(idCol), size(col("__ts")).cast("long").as("dl"))
    val logits = toks
      .select(col(idCol), explode(col("__ts")).as("__t"))
      .select(col(idCol), pmod(xxhash64(col("__t")), lit(dim.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__m"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        col("__b"),
        (col("__m").cast("double") * weightOf(col("__b"))).as("__v")))).as("__bv"))
      .select(col(idCol),
        aggregate(col("__bv"), lit(0.0), (acc, e) => acc + e.getField("__v")).as("__s"))
    base
      .join(logits, Seq(idCol), "left")
      .select(col(idCol), col("dl"),
        round(lit(1.0) / (lit(1.0) +
          exp(-coalesce(col("__s") / col("dl").cast("double"), lit(0.0)))), 6)
          .as("quality_prob"))
  }
}
