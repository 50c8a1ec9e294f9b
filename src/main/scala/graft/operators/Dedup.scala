package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication for large text corpora — the operations a 100 TB
  * training-data pipeline needs (not in the reference, which only has
  * whole-row semantics via its Eq instance; SURVEY §7.1 north-star).
  *
  * Scale design notes (every method, 1000-executor reading):
  *   - exact: one hash-shuffle on the group key, map-side combine first;
  *   - MinHash/SimHash LSH: signatures are computed per-row (narrow,
  *     codegen'd array expressions), then ONE shuffle on (band, bandHash)
  *     buckets; candidate pairs never materialize the n^2 cross product —
  *     only same-bucket pairs, verified exactly afterwards;
  *   - nothing collects to the driver.
  */
object Dedup {

  /** Exact dedup: one survivor (min of `keep`) per distinct key tuple.
    * A single groupBy shuffle with partial aggregation. */
  def exact(df: DataFrame, keys: Seq[String], keep: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(keep)).as(keep), count(lit(1)).as("n_dups"))

  /** MinHash signature (array<long> of length `numHashes`) over a column
    * of string shingles. Hash function i is `xxhash64(seed+i, baseHash)` —
    * a distinct 64-bit hash per seed, wrapping internally (safe under ANSI
    * mode, unlike explicit multiply-add families). Per-row, no shuffle. */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val baseHashes = transform(shingles, s => xxhash64(s))
    val sig = (0 until numHashes).map { i =>
      array_min(transform(baseHashes, h => xxhash64(lit(seed + i), h)))
    }
    array(sig: _*)
  }

  /** MinHash + LSH banding: returns candidate duplicate pairs
    * (id_a < id_b) whose signatures collide in >= 1 of `bands` bands, with
    * their exact shingle-Jaccard similarity attached.
    *
    * Pipeline: shingle -> signature (narrow) -> explode bands (xB rows) ->
    * ONE shuffle grouping by (band, bandHash) -> in-bucket self-join ->
    * exact verify. Bucket join is on the band hash, so skew only occurs if
    * a near-identical cluster is huge — cap with `maxBucket`. */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol), wordShingles(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes, seed))
    val banded = withSig.select(
      col(idCol),
      col("__sh"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))))
              .as("bh")))).as("__band"))
      .select(col(idCol), col("__sh"), col("__band.band"), col("__band.bh"))
    // cap pathological buckets (all-identical spam clusters)
    val capped = banded
      .withColumn(
        "__rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bh"))
            .orderBy(col(idCol))))
      .filter(col("__rn") <= maxBucket)
    val a = capped.select(
      col("band"), col("bh"),
      col(idCol).as("id_a"), col("__sh").as("__sh_a"))
    val b = capped.select(
      col("band"), col("bh"),
      col(idCol).as("id_b"), col("__sh").as("__sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(jaccard(col("__sh_a"), col("__sh_b")), 6).as("jaccard"))
      .distinct()
  }

  /** 64-bit SimHash over token hashes: bit j of the result is the sign of
    * sum over tokens of (+1 if bit j of xxhash64(token) else -1).
    * Per-row array arithmetic, codegen'd, no shuffle. */
  /** The 64 single-bit masks as a literal array column (static, so no
    * dynamic shifts are needed inside lambdas — everything stays
    * codegen-friendly). */
  private val bitMasks: Seq[Long] = (0 until 64).map(j => 1L << j)

  def simhash(text: Column): Column = {
    val hashes = transform(tokens(lower(text)), t => xxhash64(t))
    val maskArr = array(bitMasks.map(lit): _*)
    val counts = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(
          acc,
          transform(maskArr, m =>
            when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)),
          (a, d) => a + d))
    aggregate(
      zip_with(counts, maskArr, (c, m) => when(c > 0, m).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) <= maxHamming.
    * The 64 bits are banded into `maxHamming + 1` contiguous chunks, so by
    * pigeonhole any pair within the distance bound collides on at least
    * one chunk — recall is guaranteed, and the only shuffle is the
    * chunk-value equi-join. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming in [0, 32)")
    val nChunks = maxHamming + 1
    val sh = df.select(col(idCol), simhash(col(textCol)).as("__sim"))
    // contiguous bit ranges with widths differing by <= 1; shift amounts
    // are static so this is a plain Scala-side loop of literal structs
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    val chunkStructs = (0 until nChunks).map { c =>
      val lo = bounds(c)
      val width = bounds(c + 1) - lo
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(
        lit(c).as("chunk"),
        shiftright(col("__sim"), lo).bitwiseAND(mask).as("cv"))
    }
    val chunked = sh.select(
      col(idCol),
      col("__sim"),
      explode(array(chunkStructs: _*)).as("__c"))
      .select(col(idCol), col("__sim"), col("__c.chunk"), col("__c.cv"))
    val a = chunked.select(
      col("chunk"), col("cv"), col(idCol).as("id_a"), col("__sim").as("__sim_a"))
    val b = chunked.select(
      col("chunk"), col("cv"), col(idCol).as("id_b"), col("__sim").as("__sim_b"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        bit_count(col("__sim_a").bitwiseXOR(col("__sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity join, blocked by a cheap key to avoid
    * the n^2 cross product (here: a blocking column such as language or an
    * LSH bucket). Emits pairs with jaccard >= threshold. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double,
      useUnigrams: Boolean = true,
      shingleSize: Int = 3): DataFrame = {
    val setExpr =
      if (useUnigrams) tokenSet(col(textCol))
      else wordShingles(col(textCol), shingleSize)
    val prepared = df.select(col(blockCol).as("__blk"), col(idCol), setExpr.as("__set"))
    val a = prepared.select(
      col("__blk"), col(idCol).as("id_a"), col("__set").as("__set_a"))
    val b = prepared.select(
      col("__blk"), col(idCol).as("id_b"), col("__set").as("__set_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(jaccard(col("__set_a"), col("__set_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-dup via random-hyperplane LSH with OR-amplification:
    * `nTables` independent hash tables of `planesPerTable` sign bits each.
    * A pair is a candidate if it collides in ANY table (recall
    * `1-(1-p^planes)^tables`, p = 1 - angle/pi), then verified with exact
    * cosine. One shuffle keyed by (table, signature); candidates never
    * approach n^2. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      planesPerTable: Int = 6,
      nTables: Int = 6,
      seed: Long = 42L): DataFrame = {
    val tableSigs = (0 until nTables).map { t =>
      val planes =
        VectorFunctions.seededPlanes(planesPerTable, dim, seed + 7919L * t)
      struct(
        lit(t).as("tbl"),
        VectorFunctions.hyperplaneSignature(col(vecCol), planes).as("sig"))
    }
    val sigd = df.select(
      col(idCol),
      col(vecCol).cast("array<double>").as("__v"),
      explode(array(tableSigs: _*)).as("__t"))
      .select(col(idCol), col("__v"), col("__t.tbl"), col("__t.sig"))
    val a = sigd.select(
      col("tbl"), col("sig"), col(idCol).as("id_a"), col("__v").as("__va"))
    val b = sigd.select(
      col("tbl"), col("sig"), col(idCol).as("id_b"), col("__v").as("__vb"))
    a.join(b, Seq("tbl", "sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct()
  }
}
