package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (JASA 1969),
  * the standard framework behind every production entity-resolution
  * system (Splink, dedupe.io): candidate pairs from BLOCKING, a
  * comparison vector γ of per-field agreement indicators, and a
  * log-likelihood-ratio match score
  *
  *   score(a,b) = Σ_f  γ_f ? log2(m_f / u_f) : log2((1-m_f)/(1-u_f))
  *
  * where m_f = P(field f agrees | true match) and u_f = P(agrees |
  * non-match). Two thresholds give the three-way decision rule the
  * model is named for: match / possible (clerical review) / non-match.
  *
  * This is a different animal from the similarity dedup family
  * ([[Dedup]]): those ask "is this text near-identical", linkage asks
  * "do these STRUCTURED records denote the same entity" with per-field
  * evidence weights — low-cardinality fields (segment) contribute
  * little, high-discrimination fields (name) dominate, and DISAGREEMENT
  * is evidence too.
  */
object Linkage {

  /** One comparison field: `col` must exist in both inputs; `agree`
    * receives (a-side column, b-side column) and returns the γ_f
    * boolean; `m`/`u` are the conditional agreement probabilities. */
  final case class FieldSpec(
      col: String,
      agree: (Column, Column) => Column,
      m: Double,
      u: Double) {
    require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0, s"m/u in (0,1) for $col")
    require(m > u, s"agreement must be evidence FOR a match (m > u) for $col")
  }

  /** 6-dp-quantized log2 likelihood weight — quantized ON THE DRIVER so
    * the weights enter both the Spark plan and any replaying oracle as
    * identical double literals (log2 is not correctly rounded
    * cross-engine; a fixed-shape sum over identical literals is). */
  private[graft] def weight(p: Double, q: Double): Double =
    math.rint(math.log(p / q) / math.log(2.0) * 1e6) / 1e6

  /** Blocked Fellegi–Sunter linkage of `a` to `b`.
    *
    * Output: one row per candidate pair with score ≥ `lower`:
    * (a_<idCol>, b_<idCol>, score, decision) where decision is
    * 'match' (score ≥ upper) or 'possible'.
    *
    * Scale shape: candidates are the within-block pairs of a
    * (blockCols)-keyed equi-join — never all-pairs; both sides'
    * blocks are capped at `maxBlock` rows (deterministically, by id
    * order — the [[Dedup.lshCandidatePairs]] discipline) so one
    * pathological block (null city, 'UNKNOWN' everything) cannot go
    * quadratic. Only (id, block, field) columns ride the join —
    * payloads stay in the scans. The score is a fixed-shape
    * left-associated sum of driver-quantized literal weights, so an
    * oracle replaying the same blocking and γ computes it
    * bit-for-bit (d24's gate). The cap is PART OF that contract: an
    * oracle that replays the blocking join uncapped matches only while
    * no block on either side exceeds `maxBlock` — verify with
    * [[cappedBlocks]] (empty on both sides ⇒ the cap never bound), as
    * `LinkageSpec` does for the registered d24/d26/d27 fixtures. */
  def fellegiSunter(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[FieldSpec],
      lower: Double,
      upper: Double,
      maxBlock: Int = 10000): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(fields.nonEmpty, "need at least one comparison field")
    require(lower <= upper, "lower must not exceed upper")
    require(maxBlock >= 1, "maxBlock must be positive")
    // block columns stay unprefixed (they're the join key); id and
    // comparison fields get side prefixes
    def side(df: DataFrame, p: String): DataFrame =
      df.select(col(idCol).as(s"$p$idCol") +: blockCols.map(col) ++:
          fields.map(f => col(f.col).as(s"$p${f.col}")): _*)
        .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(blockCols.map(col): _*).orderBy(col(s"$p$idCol"))))
        .filter(col("__rn") <= maxBlock)
        .drop("__rn")
    val pairs = side(a, "a_").join(side(b, "b_"), blockCols)
    val score = fields
      .map(f => when(
        f.agree(col(s"a_${f.col}"), col(s"b_${f.col}")),
        lit(weight(f.m, f.u))).otherwise(lit(weight(1.0 - f.m, 1.0 - f.u))))
      .reduce(_ + _)
    pairs
      .withColumn("score", score)
      .filter(col("score") >= lit(lower))
      .select(
        col(s"a_$idCol"), col(s"b_$idCol"), col("score"),
        when(col("score") >= lit(upper), lit("match"))
          .otherwise(lit("possible")).as("decision"))
  }

  /** Persist a linkage REFERENCE as a block-bucketed table — the
    * entity-resolution service shape: the master record set is linked
    * against continuously (new customer batches, arriving claims), so
    * its block-keyed shuffle should be paid ONCE at build. Probes then
    * join block-to-bucket with zero index-side exchange, and the
    * per-block cap window runs bucket-local for the same reason. Stores
    * the pruned (id, blocks, comparison fields) projection — payload
    * columns never enter the index. Same single-writer, append-only
    * discipline as the other four index families. */
  def writeReferenceIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      reference: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[FieldSpec],
      numBuckets: Int = 8): Unit =
    Bucketing.writeBucketed(
      referenceProjection(reference, idCol, blockCols, fields),
      table, blockCols, numBuckets)

  /** Append a reference batch to a [[writeReferenceIndex]] table —
    * batch-proportional (one keyed shuffle of the NEW rows; existing
    * bucket files untouched). Append ≡ rebuild exactly: the index is a
    * plain row set, no per-build state. */
  def appendReference(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      batch: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[FieldSpec],
      numBuckets: Int = 8): Unit =
    Bucketing.appendBucketed(
      referenceProjection(batch, idCol, blockCols, fields),
      table, blockCols, numBuckets)

  /** Link a probe batch against the persisted reference — EXACTLY
    * [[fellegiSunter]] with the index as the b side (same caps, same
    * weights, bit-identical scores), but the reference's join and
    * cap-window distribution come free from the bucket layout. */
  def probeReferenceIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      probe: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[FieldSpec],
      lower: Double,
      upper: Double,
      maxBlock: Int = 10000): DataFrame =
    fellegiSunter(
      probe, spark.table(table), idCol, blockCols, fields,
      lower, upper, maxBlock)

  private def referenceProjection(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[FieldSpec]): DataFrame =
    df.select((idCol +: blockCols ++: fields.map(_.col)).map(col): _*)
      .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))

  /** Diagnostic: the blocks of `df` whose row count EXCEEDS `maxBlock` —
    * i.e. the blocks where [[fellegiSunter]]'s per-side cap would
    * actually drop rows. Output: (blockCols..., block_rows, dropped).
    *
    * The cap is part of fellegiSunter's RESULT contract, not just a
    * safety valve: an oracle that replays the blocking join without it
    * (the d24/d26/d27 DuckDB oracles do) is only equivalent when this
    * relation is EMPTY on both sides. Run it per side before trusting
    * an uncapped replay — or in production, before trusting recall on a
    * corpus with degenerate blocks (null city, 'UNKNOWN' everything).
    * One aggregation over the pruned (blockCols) projection; no join. */
  def cappedBlocks(
      df: DataFrame,
      blockCols: Seq[String],
      maxBlock: Int = 10000): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(maxBlock >= 1, "maxBlock must be positive")
    df.filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("block_rows"))
      .filter(col("block_rows") > maxBlock)
      .withColumn("dropped", col("block_rows") - maxBlock)
  }
}
