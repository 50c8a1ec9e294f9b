package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the way a 100 TB pipeline samples:
  * no RNG state, no sort, no sampling pass. A row's fate is a pure
  * function of its id, so samples are reproducible across reruns,
  * partitionings and cluster sizes, stable under corpus growth (adding
  * rows never flips existing decisions), and cheap (one hash expression
  * fused into the scan).
  *
  * Beyond the reference's scope (Frames has no sampling); complements the
  * deterministic split (p03) and stratified quota sample (q43).
  */
object Sampling {

  /** Uniform keep-decision with probability `rate`:
    * pmod(xxhash64(id), buckets) < rate * buckets. */
  def uniformKeep(idCol: Column, rate: Double, buckets: Long = 1000000L): Column =
    pmod(xxhash64(idCol), lit(buckets)).cast("double") < lit(rate * buckets)

  /** Weighted keep-decision: accept with probability `acceptProb` (a
    * per-row Column in [0,1], e.g. a quality score scaled by a global
    * rate). The hash is uniform on [0, buckets), so
    * P(keep) = acceptProb exactly (up to 1/buckets quantization). */
  def weightedKeep(idCol: Column, acceptProb: Column, buckets: Long = 1000000L): Column =
    pmod(xxhash64(idCol), lit(buckets)).cast("double") < acceptProb * lit(buckets.toDouble)

  /** Exact-k weighted sample WITHOUT replacement per group — the
    * Efraimidis–Spirtakis (2006) one-pass rule made deterministic:
    * each row draws u ∈ (0,1] from its id hash
    * (u = (pmod(xxhash64(id), buckets)+1)/(buckets+1)) and the k rows
    * with the smallest −ln(u)/w win — distributionally identical to
    * drawing k items with probability proportional to weight, without
    * replacement, but with no RNG state, reproducible across reruns,
    * partitionings and cluster sizes. Complements [[weightedKeep]]
    * (rate-based, size varies) when the contract is EXACTLY k per
    * group (k best-of-weighted examples per source, per language...).
    *
    * Quantization discipline (t37/g07's quantize-the-ln): −ln(u)
    * rounds to a 1e-6-grid long FIRST, then the key is exact integer
    * arithmetic (lnq × 10⁹ div w) — ranking replays bit-for-bit in the
    * DuckDB oracle and is partitioning-independent; ties break on id.
    * Rows with w ≤ 0 are never sampled (excluded, as E–S prescribes).
    * Weights MUST be integral (the exact-integer key demands it): a
    * fractional weight RAISES in-plan rather than silently flooring —
    * a weight in (0,1) would otherwise vanish and 2.7 would sample as
    * 2, changing inclusion probabilities without a trace. Callers with
    * genuinely fractional weights scale them into an integer domain
    * first (e.g. `round(w * 1e6)`), which preserves proportionality.
    * Overflow headroom: lnq ≤ ln(buckets+1)×10⁶ ≈ 1.4×10⁷, ×10⁹ well
    * inside a long.
    *
    * Scale shape: the draw is one hash + ln fused into the scan;
    * selection is a per-group WindowGroupLimit (per-partition top-k
    * heaps before the single keyed exchange) — no global sort, no
    * sampling pass. */
  def weightedSampleK(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weightCol: String,
      k: Int,
      buckets: Long = 1048576L): DataFrame = {
    require(k >= 1 && buckets >= 2,
      s"bad weightedSampleK params: k=$k buckets=$buckets")
    val h = pmod(xxhash64(col(idCol)), lit(buckets))
    val u = (h + lit(1L)).cast("double") / lit((buckets + 1).toDouble)
    val lnq = round(-log(u) * lit(1000000.0), 0).cast("long")
    // the weight rides a pre-aliased cast column, NOT a raw `$weightCol`
    // splice into the SQL string — a name needing backticks would break
    // analysis and a name like `a-b` would silently parse as subtraction.
    // Integral-weight guard: `div` is integer division, so a fractional
    // weight would silently floor (0.7 → excluded entirely, 2.7 → 2),
    // changing inclusion probabilities with no error — raise in-plan
    // instead. Nulls stay null (and are excluded by the w > 0 filter,
    // as before); integral doubles (2.0) pass.
    val wc = col(weightCol)
    val wGuarded = when(wc.isNull, lit(null).cast("long"))
      .when(wc === floor(wc), wc.cast("long"))
      .otherwise(raise_error(concat(
        lit("weightedSampleK: weights must be integral, got "),
        wc.cast("string"))).cast("long"))
    val keyed = df
      .withColumn("__lnq", lnq)
      .withColumn("__es_w", wGuarded)
      .filter(col("__es_w") > 0L)
      .withColumn("__es_key", expr("__lnq * 1000000000L div __es_w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__es_key").asc, col(idCol).asc)
    keyed
      .withColumn("es_rank", row_number().over(w))
      .filter(col("es_rank") <= k)
      .drop("__lnq", "__es_w", "__es_key")
  }

  /** Deterministic global shuffle into training shards — the epoch-
    * shuffle every training run needs, with none of the usual RNG
    * nondeterminism: each row's shard is `pmod(xxhash64(id, seed),
    * nShards)` and its position within the shard is its rank by
    * `(xxhash64(id, seed), id)`. The permutation is a pure function of
    * (ids, seed): reproducible across reruns, partitionings and cluster
    * sizes; a different `seed` gives an independent permutation per
    * epoch with NO extra shuffle of state.
    *
    * Scale shape: the hash is fused into the scan; the only exchange is
    * the shard-keyed window (one shuffle), and each shard's rank sort
    * is per-partition. Writing one file per shard then streams training
    * data in (shard, pos) order with no further sort. Shard sizes are
    * Binomial(n, 1/nShards) — tight around n/nShards at corpus scale. */
  /** Leakage-free deterministic split: near-duplicates of one document
    * must all land in the SAME split, or the test set scores documents
    * the model effectively trained on — the split-contamination failure
    * mode a per-document hash split (p03) cannot avoid. Every document
    * hashes its near-dup CLUSTER representative (`comps` = (id, comp)
    * from [[Dedup.connectedComponents]] over the verified pair graph;
    * unclustered documents fall back to their own id), so a whole
    * cluster shares one bucket draw and can never straddle a split
    * boundary. `bounds` are cumulative percentile cuts over `buckets`
    * hash buckets, ascending, last one = buckets (e.g. train/80,
    * val/90, test/100).
    *
    * Decisions stay pure functions of (id, cluster structure): adding
    * documents never flips an existing UNCLUSTERED document's split,
    * and a grown cluster moves as one unit. Scale shape: one id-keyed
    * join against the cluster relation (clustered docs only — a few
    * percent of a deduplicated corpus; AQE broadcasts it when small)
    * plus a scan-fused hash — no extra shuffle beyond the join. */
  def clusterAwareSplit(
      docs: org.apache.spark.sql.DataFrame,
      comps: org.apache.spark.sql.DataFrame,
      idCol: String,
      bounds: Seq[(String, Int)],
      buckets: Int = 100): org.apache.spark.sql.DataFrame = {
    require(bounds.nonEmpty && bounds.last._2 == buckets,
      s"bounds must end at buckets=$buckets, got $bounds")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      s"bounds must be ascending, got $bounds")
    val rep = comps.select(col("id").as(idCol), col("comp").as("__rep"))
    val bucket = pmod(xxhash64(col("split_key")), lit(buckets.toLong))
    val split = bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((name, cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
    docs.join(rep, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("__rep"), col(idCol)))
      .withColumn("split", split)
      .drop("__rep")
  }

  def shuffleShards(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      nShards: Int,
      seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = xxhash64(col(idCol), lit(seed))
    df.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("pos",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard"))
            .orderBy(h.asc, col(idCol).asc)).cast("long"))
  }

  /** Deterministic WEIGHTED-INTERLEAVE schedule — the smooth
    * round-robin mixing order a trainer consumes when sources must
    * appear at controlled RATES rather than in shuffled-together bulk
    * (the torchdata/T5-style multi-source interleave): source s gets a
    * STRIDE ∝ 1/weight_s (weight = sqrt of its mass, the alpha = 0.5
    * temperature rule of p04), each document gets a hash-shuffled rank
    * WITHIN its source, and the schedule key is
    * `rank × stride + (xxhash64(source) pmod stride)` — the per-source
    * PHASE offset de-collides sources with EQUAL strides (equal
    * masses), whose bare `rank × stride` keys would otherwise tie at
    * every rank. Sorting by the key yields each source spaced evenly
    * at its rate, exhausted sources simply stop appearing, and every
    * run/partitioning/engine produces the identical key set (exact
    * long keys; sqrt and one division are the only float ops,
    * identically rounded). The offset makes same-stride ties a hash
    * coincidence rather than the rule, but a CONSUMER materializing
    * the order must still tie-break totally — sort by
    * `(sched_key, source, id)`, as p25 does.
    *
    * Scale shape: one keyed aggregation for the masses (broadcast
    * back), one per-source window for ranks, and the key is a scalar —
    * consumers take the head via TakeOrderedAndProject (never a global
    * sort) or materialize the full order with a range-partitioned
    * write, exactly like [[writeTrainingShards]]. Output adds
    * (src_rank, sched_key) to (idCol, sourceCol). */
  def interleaveSchedule(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      sourceCol: String,
      massExpr: org.apache.spark.sql.Column,
      strideScale: Long = 1000000000L): org.apache.spark.sql.DataFrame = {
    require(strideScale >= 1, s"strideScale must be >= 1, got $strideScale")
    val masses = df
      .groupBy(col(sourceCol))
      .agg(sum(massExpr.cast("long")).as("__mass"))
      .select(col(sourceCol),
        greatest(lit(1L),
          round(lit(strideScale.toDouble) /
            sqrt(col("__mass").cast("double")), 0).cast("long")).as("__stride"))
    val h = xxhash64(col(idCol))
    df.join(broadcast(masses), Seq(sourceCol))
      .withColumn("src_rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(sourceCol))
            .orderBy(h.asc, col(idCol).asc)).cast("long"))
      .withColumn("sched_key",
        col("src_rank") * col("__stride") +
          pmod(xxhash64(col(sourceCol)), col("__stride")))
      .drop("__stride")
  }

  /** Curriculum schedule — stage the corpus easy-to-hard (Bengio et al.
    * ICML'09; length- or perplexity-ordered warmups are the standard
    * instantiation) and hash-shuffle WITHIN each stage: the trainer
    * consumes stages in order, but inside a stage sees an unbiased
    * shuffle, so difficulty ramps without per-batch ordering bias.
    *
    * Stage cuts are VALUE thresholds over the difficulty histogram
    * (the t34 perplexityBuckets discipline): cut_s = the smallest
    * difficulty whose ascending cumulative count reaches ⌈s·n/stages⌉,
    * and a document's stage = #{s : difficulty > cut_s} — so equal
    * difficulties always share a stage (a stage may exceed n/stages on
    * a tie), and the assignment is a pure function of the difficulty
    * MULTISET, reproducible across partitionings and engines (integer
    * arithmetic only).
    *
    * Scale shape: one (difficulty)-keyed histogram aggregation with
    * map-side partials (state = the quantized-difficulty grid,
    * persisted for its two readers), the grid's ascending cumulative
    * via the parallel [[graft.plans.PrefixSumExec]] — a fine grid can
    * be millions of rows, so no unpartitioned window even here — and
    * the ≤(stages−1) cut values COLLECTED into scan-local literals
    * (one bounded row), so staging is a pure projection; the
    * intra-stage shuffle is one (stage, shard)-keyed window, the same
    * single exchange as [[shuffleShards]]. Callers with continuous
    * difficulties quantize first (the house grid rule);
    * `difficultyCol` must be integral.
    *
    * Output adds (stage, shard, pos): stage ∈ [0, stages), shard ∈
    * [0, nShards), pos = 1-based rank by (xxhash64(id, seed), id)
    * within (stage, shard). */
  def curriculumShards(
      df: DataFrame,
      idCol: String,
      difficultyCol: String,
      stages: Int,
      nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(stages >= 1, s"stages must be positive, got $stages")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = xxhash64(col(idCol), lit(seed))
    val staged =
      if (stages == 1) df.withColumn("stage", lit(0))
      else {
        val hist = df
          .groupBy(col(difficultyCol).cast("long").as("__d"))
          .agg(count(lit(1)).as("__c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cutVals =
          try {
            val nRow = hist.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))
            val cum = graft.Frame
              .withPrefixSum(hist, Seq(col("__d").asc), col("__c"),
                "__idx", "__before")
              .withColumn("__cum", col("__before") + col("__c"))
            val cutCols = (1 until stages).map(s =>
              min(when(
                col("__cum") >= expr(s"($s * __n + ${stages - 1}) div $stages"),
                col("__d"))).as(s"__cut$s"))
            // ≤(stages-1) values, one bounded row — scan-local literals
            // beat a crossJoin the audit would have to trace
            cum.crossJoin(broadcast(nRow))
              .agg(cutCols.head, cutCols.tail: _*)
              .collect()(0)
          } finally {
            hist.unpersist(blocking = false)
            ()
          }
        val stage = (1 until stages).foldLeft(lit(0)) { (acc, s) =>
          val cut =
            if (cutVals.isNullAt(s - 1)) lit(null).cast("long")
            else lit(cutVals.getLong(s - 1))
          acc + when(col(difficultyCol).cast("long") > cut, 1).otherwise(0)
        }
        df.withColumn("stage", stage)
      }
    staged
      .withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("stage"), col("shard"))
            .orderBy(h.asc, col(idCol).asc)).cast("long"))
  }

  /** Epoch-recipe executor — the "data recipe" step of a pretraining
    * run: each group g is assigned a (possibly fractional) epoch count
    * e_g, and every document materializes ⌊e_g⌋ copies plus one more
    * with probability frac(e_g), decided by [[weightedKeep]]'s pure
    * hash — so "Wikipedia ×2.3, CommonCrawl ×0.8" executes
    * deterministically: reproducible across reruns and partitionings,
    * stable under corpus growth (a new doc never flips an old doc's
    * fate). Groups absent from the recipe get ZERO copies (the
    * blocklist face for free).
    *
    * Flag-don't-materialize: emits (id, group, epochs, copies); the
    * trainer explodes `sequence(1, copies)` at shard-write time (and
    * varies the shuffle seed per copy). One broadcast recipe join, one
    * scan-fused hash — corpus rows never shuffle. */
  def epochRecipe(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      groupCol: String,
      epochs: Seq[(String, Double)],
      buckets: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    require(epochs.nonEmpty, "epoch recipe must be non-empty")
    require(epochs.forall(_._2 >= 0.0), s"negative epochs in $epochs")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val tg = epochs.toDF(groupCol, "__e")
    df.join(broadcast(tg), Seq(groupCol), "left")
      .select(col(idCol), col(groupCol),
        round(coalesce(col("__e"), lit(0.0)), 6).as("epochs"),
        (floor(coalesce(col("__e"), lit(0.0))).cast("long") +
          when(
            weightedKeep(col(idCol),
              coalesce(col("__e"), lit(0.0)) -
                floor(coalesce(col("__e"), lit(0.0))).cast("double"),
              buckets),
            1L).otherwise(0L)).as("copies"))
  }

  /** Downsample to a TARGET MIXTURE — the "rebalance the corpus to the
    * planned source/language proportions" pass a pretraining run does
    * after curation: every group g gets the deterministic accept
    * probability min(1, share_g · N / n_g), so over-represented groups
    * thin toward their target share and under-represented ones keep
    * everything (resampling can only DROP; reaching an exact mixture
    * against a binding cap is the caller's iteration or p04's
    * oversample knob). Groups absent from `targets` drop entirely —
    * the blocklist face for free. Per-row fate is [[weightedKeep]]'s
    * pure hash function: reproducible, growth-stable, engine-exact.
    *
    * Scale shape: one group-size aggregation (groups-sized, broadcast
    * back), then a scan-fused hash compare — corpus rows never
    * shuffle. Returns the input keys plus (accept_prob, kept);
    * flag-don't-drop, like [[quotaCap]]. */
  def mixtureResample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      groupCol: String,
      targets: Seq[(String, Double)],
      buckets: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.forall(_._2 >= 0.0), s"negative target share in $targets")
    val spark = df.sparkSession
    import spark.implicits._
    val tg = targets.toDF(groupCol, "__target")
    val sz = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val tot = sz.agg(sum(col("__n")).as("__nt"))
    val rates = sz.crossJoin(broadcast(tot))
      .join(broadcast(tg), Seq(groupCol), "left")
      .select(col(groupCol),
        least(lit(1.0),
          coalesce(col("__target"), lit(0.0)) * col("__nt").cast("double")
            / col("__n").cast("double")).as("__accept"))
    df.join(broadcast(rates), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        round(col("__accept"), 6).as("accept_prob"),
        weightedKeep(col(idCol), col("__accept"), buckets).as("kept"))
  }

  /** Token-BALANCED training shards — cut the (deterministically
    * shuffled) corpus into shards of ~`targetWeight` tokens EACH,
    * rather than [[shuffleShards]]' equal document COUNTS: trainer
    * throughput is token-bound, and a shard of 1000 long documents is
    * not the same unit of work as a shard of 1000 tweets. Documents
    * are never split: a document belongs to the shard its leading
    * token offset lands in, so every shard's mass is `targetWeight`
    * ± one document.
    *
    * The global token offset is the distributed prefix sum
    * ([[graft.plans.PrefixSumExec]]) under the (xxhash64(id, seed),
    * id) shuffle order — a range-partitioned parallel sort, never a
    * single-task window — so the assignment is a pure function of
    * (ids, weights, seed): reproducible across partitionings and
    * engines, and a different `seed` reshuffles without extra state.
    * Output: (id, weight, global_offset, shard, pos-within-shard). */
  def balancedShards(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      targetWeight: Long,
      seed: Long = 42L): DataFrame = {
    require(targetWeight >= 1L, s"targetWeight must be >= 1, got $targetWeight")
    val h = xxhash64(col(idCol), lit(seed))
    graft.Frame
      .withPrefixSum(df.select(col(idCol), col(weightCol)),
        Seq(h.asc, col(idCol).asc), col(weightCol).cast("long"),
        "__idx", "__off")
      .withColumn("shard", expr(s"__off div ${targetWeight}L"))
      .select(col(idCol), col(weightCol),
        col("__off").as("global_offset"), col("shard"),
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard")).orderBy(col("__idx")))
          .cast("long").as("pos"))
  }

  /** Temperature-scaled mixture resampling — the mT5/XLM-R alpha
    * sampling rule: rebalance group masses from p_l ∝ n_l to
    * q_l ∝ n_l^alpha (alpha < 1 upsamples the tail RELATIVELY by
    * thinning the head), implemented as per-group thinning with
    *   accept_l = (n_l / n_min)^(alpha−1)
    * so the smallest group keeps everything and group masses land
    * ∝ n_l^alpha exactly — no targets table to maintain, unlike
    * [[mixtureResample]], just the one temperature knob.
    *
    * Determinism: the exponent evaluates once per GROUP as
    * exp((alpha−1)·(ln n_l − ln n_min)) and quantizes to a long
    * threshold at `buckets` before any per-row decision; rows then
    * keep via the integer-vs-integer xxhash64 compare (no doubles in
    * the row path). The per-group ln/exp follow the t12/g07
    * round-over-libm contract.
    *
    * Scale shape: one (group) count aggregation, a broadcast
    * single-row min, and a broadcast rate join back onto the scan —
    * corpus rows never shuffle, and the same plan runs as a stateless
    * streaming select past the (static) rate table. */
  def temperatureResample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double,
      buckets: Long = 1000000L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(buckets >= 2L, s"buckets must be >= 2, got $buckets")
    val sz = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val mn = sz.agg(min(col("__n")).as("__nmin"))
    val rates = sz.crossJoin(broadcast(mn))
      .select(col(groupCol),
        round(exp(lit(alpha - 1.0) *
          (log(col("__n").cast("double")) - log(col("__nmin").cast("double"))))
          * buckets.toDouble, 0).cast("long").as("__aq"))
    df.join(broadcast(rates), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        round(col("__aq").cast("double") / buckets.toDouble, 6)
          .as("accept_prob"),
        (pmod(xxhash64(col(idCol)), lit(buckets)) < col("__aq")).as("kept"))
  }

  /** Per-group document QUOTA — the RefinedWeb/C4-style cap on how many
    * documents any one domain/source may contribute, applied as "keep
    * the BEST k" rather than "keep an arbitrary k": rows rank within
    * their group by the caller's preference order (quality descending,
    * id ascending — any total order) and rows past `maxPerGroup` are
    * flagged, not dropped, so the caller chooses between
    * `filter(col("kept"))` and auditing the casualties. A cap bounds
    * the INFLUENCE of template-farm domains that survive per-document
    * quality filters precisely because their boilerplate is
    * well-formed — the failure mode per-row scoring cannot see.
    *
    * Scale shape: one group-keyed window (rank + flag in the same
    * frame), no join, no second pass; with millions of domains the key
    * is high-cardinality and skew-free. The rank must be a TOTAL order
    * (tie-break on the id) or the kept set is partitioning-dependent. */
  def quotaCap(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      maxPerGroup: Int,
      orderBy: Seq[Column]): org.apache.spark.sql.DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup must be >= 1, got $maxPerGroup")
    require(orderBy.nonEmpty, "orderBy must give a total order within the group")
    df.withColumn("src_rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(groupCol))
            .orderBy(orderBy: _*)))
      .withColumn("kept", col("src_rank") <= maxPerGroup)
  }

  /** Materialize [[shuffleShards]]' permutation to disk — the training
    * export: one `shard=<k>` directory per shard, rows PHYSICALLY
    * stored in `pos` order, so any reader (a trainer's data loader, not
    * just Spark) streams each shard file start-to-finish and sees the
    * epoch permutation with zero further sorting. One shuffle total:
    * the shard repartition; the per-shard order is a within-partition
    * sort that spills, never collects. At real scale bound file sizes
    * with `maxRecordsPerFile` — multiple files per shard stay ordered
    * because part-file names sort in write-task order.
    *
    * Returns the manifest (shard, n_rows, min_pos, max_pos) read back
    * from the COMMITTED files — n_rows == max_pos == the dense rank
    * count, a per-shard integrity check the caller can persist next to
    * the data. */
  def writeTrainingShards(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      dir: String,
      nShards: Int,
      seed: Long = 42L,
      maxRecordsPerFile: Long = 0L): org.apache.spark.sql.DataFrame = {
    val sharded = shuffleShards(df, idCol, nShards, seed)
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(dir)
    // the shard= directory value re-infers as INT on read; pin long
    df.sparkSession.read.parquet(dir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"))
  }
}
