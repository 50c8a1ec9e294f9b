package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw document by how target-like its hashed
  * bag-of-bigrams is, `w(doc) = sum over bigram occurrences of
  * ln(p_target[bucket] / p_raw[bucket])`, where both distributions are
  * Laplace-smoothed counts of hashed word bigrams in a fixed number of
  * buckets. Selecting the top-w documents reweights the raw corpus
  * toward the target domain — the standard pretraining-data-selection
  * recipe when a small high-quality target corpus (Wikipedia, books)
  * should steer what survives from a crawl.
  *
  * Beyond the reference's scope (Frames has no corpus selection); sits
  * beside the quality-score samplers (p05) and the learned scorer (t14).
  *
  * Scale shape (the point of the hashed variant): the model is just
  * `buckets` log-ratios, so the 100 TB plan is two passes —
  *  1. ONE counting job over raw ∪ target: bigrams hash into `buckets`
  *     cells in-scan, partial aggregation reduces every partition to at
  *     most `buckets` rows before the single tiny shuffle; the collected
  *     model is O(buckets), independent of corpus size.
  *  2. ONE scoring scan: the log-ratio table rides into the scan as a
  *     2 KB array literal, each document folds its bigram stream through
  *     `aggregate(...)` scan-locally — zero shuffle, zero join; the only
  *     movement after the scan is the caller's top-k.
  *
  * Determinism contract (what makes the DuckDB oracle exact): the
  * per-bucket log-ratio is computed from exact integer counts as
  * `round(ln((c_tgt+1)(T_raw+B) / ((c_raw+1)(T_tgt+B))) * 1e6)` and
  * FROZEN as a fixed-point long — the rounding runs through Spark's own
  * `round` (HALF_UP, away from zero on ties, matching DuckDB's round) in
  * a 256-row driver-side job, so both engines see identical micro-units.
  * Per-document weights are then SUMS OF LONGS — associative, exact
  * under any partitioning — and the final `weight = w_fixed / 1e6` is a
  * single correctly-rounded IEEE division. Integer products stay exact
  * in doubles while (count+1)*(total+buckets) < 2^53 — petabyte-scale
  * bigram totals; past that, swap the products for decimal division.
  */
object Dsir {

  /** Hashed-bigram features of one text column, as buckets in
    * [0, buckets): tokenize on whitespace, lowercase, adjacent pairs,
    * xxhash64 into a bucket. Occurrences, not distinct — DSIR weights
    * repeat n-grams by their count. */
  private def bigramBuckets(textCol: Column, buckets: Int): Column = {
    val grams = TextFunctions.ngrams(TextFunctions.tokens(lower(textCol)), 2)
    transform(grams, g => pmod(xxhash64(g), lit(buckets.toLong)).cast("int"))
  }

  /** The learned model: per-bucket fixed-point (1e-6) log-likelihood
    * ratios ln(p_target/p_raw), index = bucket. One counting job + one
    * 256-row driver job (see class doc for why the rounding is done by
    * Spark and not scala.math). */
  def learnLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 256): Array[Long] = {
    require(buckets > 0, s"need buckets > 0; got $buckets")
    val spark = raw.sparkSession
    def gramStream(df: DataFrame, tag: Int): DataFrame = df
      .select(explode(bigramBuckets(col(textCol), buckets)).as("__b"))
      .select(col("__b"), lit(tag).as("__t"))
    val counted = gramStream(raw, 0)
      .unionByName(gramStream(target, 1))
      .groupBy(col("__b"))
      .agg(
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("__craw"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__ctgt"))
      .collect()
    val craw = new Array[Long](buckets)
    val ctgt = new Array[Long](buckets)
    counted.foreach { r =>
      val b = r.getInt(0)
      craw(b) = r.getLong(1)
      ctgt(b) = r.getLong(2)
    }
    val traw = craw.sum
    val ttgt = ctgt.sum
    // Engine-symmetric rounding: a tiny local Dataset runs Spark's own
    // round()/log() over the exact integer counts.
    import spark.implicits._
    val lamRows = craw.indices
      .map(b => (b, craw(b), ctgt(b)))
      .toDF("__b", "__craw", "__ctgt")
      .select(
        col("__b"),
        round(
          log(
            ((col("__ctgt") + 1L) * lit(traw + buckets)).cast("double") /
              ((col("__craw") + 1L) * lit(ttgt + buckets)).cast("double")) *
            lit(1e6)).cast("long").as("__lam"))
      .collect()
    val lam = new Array[Long](buckets)
    lamRows.foreach(r => lam(r.getInt(0)) = r.getLong(1))
    lam
  }

  /** Score every `raw` document against a learned (or fresh) model:
    * columns `idCol`, `n_bigrams`, `weight` (sum of per-occurrence
    * log-ratios, in nats). The scoring scan is shuffle-free — see the
    * class doc. Pass `model` to reuse one `learnLogRatios` result across
    * pipeline consumers (the learn-once artifact shape, like t19's
    * merge table). */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256,
      model: Option[Array[Long]] = None): DataFrame = {
    val lam = model.getOrElse(learnLogRatios(raw, target, textCol, buckets))
    require(lam.length == buckets,
      s"model has ${lam.length} buckets; expected $buckets")
    val lamArr = array(lam.map(lit): _*)
    raw
      .select(
        col(idCol),
        bigramBuckets(col(textCol), buckets).as("__bs"))
      .select(
        col(idCol),
        size(col("__bs")).cast("long").as("n_bigrams"),
        aggregate(
          col("__bs"), lit(0L),
          (acc, b) => acc + element_at(lamArr, b + 1)).as("__wfix"))
      .select(
        col(idCol), col("n_bigrams"),
        (col("__wfix").cast("double") / lit(1e6)).as("weight"))
  }
}
