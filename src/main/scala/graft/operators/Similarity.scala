package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — SURVEY §7.1 north-star component.
  *
  * Two paths:
  *   - [[bruteForceKnn]]: exact baseline. Broadcast the (small) query set
  *     against the corpus — a map-side nested loop, no corpus shuffle, then
  *     a per-query top-k window. Correct at any corpus size as long as the
  *     query set is broadcastable.
  *   - [[ivfKnn]]: IVF-style scale path. A deterministic coarse quantizer
  *     (centroid list, broadcast) assigns every corpus vector to a cell
  *     (narrow); queries probe their `nProbe` closest cells, so each query
  *     scans ~nProbe/nCells of the corpus instead of all of it.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * small (it is broadcast). Ranking uses the rounded score with the
    * neighbor id as tiebreak, so results are deterministic. */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c
      .join(q, col("query_id") =!= col("neighbor_id")) // broadcast NL join
      .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic coarse centroids: the `nCells` corpus vectors with the
    * smallest `xxhash64(id)` — a pseudo-random but reproducible sample.
    * `orderBy(...).limit(n)` plans as TakeOrderedAndProject: each
    * partition keeps its local top-n and only those tiny heads reach the
    * driver — no global sort, no single-task funnel, bounded collect. */
  def sampleCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int): Array[(Long, Seq[Double])] =
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }

  /** Int8-quantized brute-force kNN: per-vector symmetric quantization
    * (q_i = round(v_i / (maxAbs/127)), so the stored corpus is int8 —
    * 4x less memory/scan bandwidth than float32, 8x less than double —
    * and scoring is EXACT integer dot products rescaled by the two
    * per-vector scales. The quantization is deterministic arithmetic, so
    * unlike classic ANN this path is exactly reproducible (and
    * oracle-able) while still being the memory layout a 100 TB vector
    * corpus actually wants. Queries broadcast; corpus never shuffles. */
  def quantizedKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    def quantize(df: DataFrame, id: String, q: String, s: String) =
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as("__v"))
        .withColumn("__ma", aggregate(col("__v"), lit(0.0), (a, x) => greatest(a, abs(x))))
        .withColumn(s, col("__ma") / 127.0)
        .withColumn(q, transform(col("__v"), x =>
          when(col("__ma") === 0.0, lit(0))
            .otherwise(round(x / col(s), 0).cast("int"))))
        .drop("__v", "__ma")
    val qs = broadcast(quantize(queries, "query_id", "__qq", "__qs"))
    val cs = quantize(corpus, "neighbor_id", "__qc", "__cs")
    val dotInt = aggregate(
      zip_with(col("__qq"), col("__qc"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = cs
      .join(qs, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(dotInt.cast("double") * col("__qs") * col("__cs"), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** The deterministic ±1 projection matrix behind [[randomProjection]]:
    * signs from a splitmix64-style avalanche of (seed, j, i), so the
    * matrix is a pure function of its arguments — reproducible on any
    * engine (the DuckDB oracle inlines the same literals). */
  def projectionSigns(inDims: Int, outDims: Int, seed: Long): Seq[Seq[Long]] =
    Seq.tabulate(outDims, inDims) { (j, i) =>
      var z = seed + 0x9e3779b97f4a7c15L * (j.toLong * inDims + i + 1L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1L else -1L
    }

  /** Signed random projection (the Achlioptas/Charikar ±1 family):
    * reduce `inDims`-dim vectors to `outDims` dims by a deterministic
    * ±1 matrix, in EXACT integer arithmetic over quantized coordinates
    * (`round(x * scale)` as long) — so unlike classic float random
    * projection the output is bit-identical across runs, partitionings,
    * and engines, and directly oracle-able. Angles are approximately
    * preserved (Johnson–Lindenstrauss), making the projected space a
    * cheap pre-filter for kNN: score in `outDims` dims, re-rank the
    * survivors with full-precision vectors.
    *
    * Scale shape: a pure projection — the matrix enters the scan as one
    * array literal, each output coordinate is a scan-local zip/fold, no
    * shuffle, no UDF, stays inside whole-stage codegen. Output vectors
    * are outDims longs per row (8 x outDims bytes — the compressed
    * representation a 100 TB re-scoring pass wants to scan).
    *
    * Magnitude envelope: |y_j| <= inDims * max|x| * scale, so any
    * unit-ish embedding is far inside Long range. */
  def randomProjection(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      inDims: Int,
      outDims: Int,
      seed: Long = 42L,
      scale: Double = 1e6): DataFrame = {
    require(inDims > 0 && outDims > 0,
      s"need positive dims; got inDims=$inDims outDims=$outDims")
    val signsLit = typedLit(projectionSigns(inDims, outDims, seed))
    val q = transform(col(vecCol).cast("array<double>"),
      x => round(x * lit(scale), 0).cast("long"))
    vectors
      .select(col(idCol), q.as("__q"))
      .select(
        col(idCol),
        transform(signsLit, row =>
          aggregate(zip_with(row, col("__q"), (s, x) => s * x),
            lit(0L), (acc, t) => acc + t)).as("proj"))
  }

  /** The `n` nearest centroid cells for a vector, scan-local: centroids
    * enter as ONE array literal, scoring/sorting is per-row array math
    * (no join, no shuffle). Shared by the inline IVF join, the index
    * writer, and the probe. */
  private def cellsFor(
      centroids: Array[(Long, Seq[Double])],
      vec: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    val centroidArr = array(centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.map(lit): _*).as("cv"))
    }: _*)
    val scored = transform(
      centroidArr,
      c => struct(
        round(cosine(vec, c("cv")), 9).as("s"),
        c("cid").as("cid")))
    val sorted = array_sort(
      scored,
      (l, r) =>
        when(l("s") > r("s"), -1).when(l("s") < r("s"), 1)
          .when(l("cid") < r("cid"), -1).when(l("cid") > r("cid"), 1)
          .otherwise(0))
    slice(transform(sorted, s => s("cid")), 1, n)
  }

  /** Corpus side of the IVF structure: (cell, neighbor_id, vector). */
  private def cellAssignments(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Seq[Double])]): DataFrame =
    corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"),
      element_at(
        cellsFor(centroids, col(vecCol).cast("array<double>"), 1), 1).as("cell"))

  /** Probe side: each query exploded to its `nProbe` best cells. */
  private def queryProbes(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Seq[Double])],
      nProbe: Int): DataFrame =
    queries.select(
      col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"),
      explode(
        cellsFor(centroids, col(vecCol).cast("array<double>"), nProbe)).as("cell"))

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF probe: assign corpus rows to their nearest centroid cell (narrow,
    * broadcast centroids), queries probe `nProbe` nearest cells; the join
    * is an equi-join on cell id — ONE shuffle keyed by cell, never n^2. */
  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[(Long, Seq[Double])],
      nProbe: Int = 4): DataFrame = {
    val c = cellAssignments(corpus, idCol, vecCol, centroids)
    val q = queryProbes(queries, idCol, vecCol, centroids, nProbe)
    topK(
      q.join(c, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), 6)),
      k)
  }

  /** PERSIST the IVF structure: cell assignments written as a bucketed
    * managed table (bucketed AND sorted by cell). The quantization —
    * the expensive full-corpus pass — is paid once at build time;
    * probes then read the table with zero shuffle (bucketing) and,
    * because `cell` is the bucket column, a literal probe-cell filter
    * prunes untouched buckets at planning time. This is the batch-vs-
    * index asymmetry of [[ivfKnn]] — the embedding analogue of the
    * incremental shard-vs-corpus dedup (p09). */
  def writeIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Seq[Double])],
      table: String,
      numBuckets: Int = 32): Unit =
    Bucketing.writeBucketed(
      cellAssignments(corpus, idCol, vecCol, centroids),
      table, bucketCols = Seq("cell"), numBuckets = numBuckets,
      sortCols = Seq("cell", "neighbor_id"))

  /** APPEND new vectors to a persisted [[writeIvfIndex]] — index
    * maintenance without rebuild: only the new rows are quantized and
    * shuffled into their cell buckets ([[Bucketing.appendBucketed]]);
    * existing index files are untouched and later probes see old and
    * new vectors alike. Centroids MUST be the build's (the standard IVF
    * contract — cell geometry is fixed at build time; re-train and
    * rebuild when drift warrants). Single-writer batch step. */
  def appendIvfIndex(
      table: String,
      newCorpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Seq[Double])],
      numBuckets: Int = 32): Unit =
    Bucketing.appendBucketed(
      cellAssignments(newCorpus, idCol, vecCol, centroids),
      table, bucketCols = Seq("cell"), numBuckets = numBuckets,
      sortCols = Seq("cell", "neighbor_id"))

  /** PURGE vectors from a persisted [[writeIvfIndex]] — the takedown
    * half of IVF maintenance ([[appendIvfIndex]] is the ingest half):
    * the given ids leave the index entirely, so no probe can ever
    * return them as neighbors. Cell geometry is row-local and fixed at
    * build time (the IVF contract), so deletion is a pure row filter —
    * purge ≡ a fresh [[writeIvfIndex]] over the surviving corpus with
    * the same centroids, unconditionally (pinned in BucketingSpec; s08
    * gates it against the DuckDB oracle). The purge set broadcasts into
    * the LEFT ANTI (it builds the RIGHT side), the index is scanned but
    * never shuffled for the filter, and the surviving rows rewrite via
    * [[Bucketing.replaceBucketed]] — materialize-then-swap, the
    * inherent cost of physical deletion in immutable storage.
    * Single-writer batch step. */
  def purgeIvfIndex(
      spark: SparkSession,
      table: String,
      purgeIds: DataFrame,
      numBuckets: Int = 32): Unit = {
    val ids = purgeIds
      .select(col(purgeIds.columns.head).cast("long").as("__pid")).distinct()
    val idx = spark.table(table)
    Bucketing.replaceBucketed(
      idx.join(broadcast(ids), idx("neighbor_id") === ids("__pid"), "left_anti"),
      table, bucketCols = Seq("cell"), numBuckets = numBuckets,
      sortCols = Seq("cell", "neighbor_id"))
  }

  /** Probe a persisted [[writeIvfIndex]] table: queries (small — they are
    * collected once to enumerate probed cells, and broadcast into the
    * join) probe their `nProbe` best cells against the INDEX ONLY.
    * Plan shape, pinned in PlanSpec: the index side has NO Exchange (the
    * query side broadcasts) and the `cell IN (probed...)` literal prunes
    * non-probed buckets inside the scan — the corpus is neither shuffled
    * nor fully read, which is the entire point of persisting the index. */
  def probeIvfIndex(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[(Long, Seq[Double])],
      nProbe: Int = 4): DataFrame = {
    val q = queryProbes(queries, idCol, vecCol, centroids, nProbe)
    // bounded: |queries| x nProbe cell ids
    val probed = q.select(col("cell")).distinct().collect().map(_.getLong(0))
    val idx = spark.table(table)
      .filter(col("cell").isin(probed.toSeq: _*))
    topK(
      broadcast(q).join(idx, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), 6)),
      k)
  }

  /** Recall@k of the IVF path against exact brute force, per query and
    * probe budget — the evaluation every production ANN deployment runs
    * to place itself on the recall/cost curve before trusting the index.
    * Output: one row per (query_id, n_probe) with `hits` (|approx top-k
    * ∩ exact top-k|) and `recall` (= hits/k, rounded to 6).
    *
    * All budgets share ONE candidate pass: each query is exploded to its
    * `max(nProbes)` best cells tagged with the probe rank, and a
    * candidate found at rank r is visible to every budget p >= r — the
    * budget expansion is a scan-local lambda filter over the budget
    * array literal, not a join, so adding budgets costs only the extra
    * per-(query,budget) window rows. A budget equal to the centroid
    * count probes every cell, making the candidate set identical to
    * brute force — recall is exactly 1.0 there by construction (same
    * rounding, same tiebreaks), which doubles as a built-in self-check
    * (pinned in SimilaritySpec, with monotonicity in n_probe).
    *
    * Scale shape: the corpus is scanned twice (truth baseline + cell
    * assignment) and never shuffled — the query side broadcasts into
    * both joins, candidates shuffle once keyed by (query, budget) for
    * the top-k windows. The exact baseline prices the evaluation at
    * |queries| x |corpus| scoring, which is why recall is measured on a
    * SAMPLED query set (the `queries` argument), never corpus x corpus. */
  def annRecallCurve(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[(Long, Seq[Double])],
      nProbes: Seq[Int]): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ > 0),
      s"need positive probe budgets; got $nProbes")
    val budgets = nProbes.distinct.sorted
    val truth = bruteForceKnn(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
    val q = queries
      .select(
        col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .select(
        col("query_id"), col("__qv"),
        posexplode(cellsFor(centroids, col("__qv"), budgets.max))
          .as(Seq("__pos", "cell")))
    val cand = broadcast(q).join(
        cellAssignments(corpus, idCol, vecCol, centroids), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("__qv"), col("__cv")), 6))
      .withColumn("n_probe",
        explode(filter(typedLit(budgets), p => col("__pos") < p)))
    val w = Window
      .partitionBy(col("query_id"), col("n_probe"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("n_probe"), col("neighbor_id"))
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"), col("n_probe"))
      .agg(
        count(col("__hit")).as("hits"),
        round(count(col("__hit")).cast("double") / k, 6).as("recall"))
  }
}
