package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy accessors for the driver-generated parquet test tables
  * (TESTDATA.md). Each accessor is a fresh lazy scan — Catalyst prunes
  * columns and pushes filters into the parquet reader per-query. */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive scan fan-out (optimization guide §2/§6, round 15).
    *
    * The compute-heavy relations (document text, event JSON, embedding
    * vectors) pay their per-row derivation cost — tokenize / shingle /
    * minhash / `get_json_object` / vector arithmetic — in the stage
    * that READS them, and a parquet scan parallelizes at row-group
    * granularity: the driver test files are one row group each, so at
    * the bench SFs that whole stage runs on ONE core of 32 (measured:
    * p12's tokenize 1.4 s single-task, d15's shingle+minhash 1.8 s
    * single-task, g12/g17's edge derivation 1.2 s single-task).
    *
    * Fix derived from input size, not tuned to either mode: when the
    * file layout yields fewer scan splits than the session's cores,
    * hash-repartition on the table's key so the derivation stage runs
    * wide; when splits >= cores (any production-sized table) this is
    * the identity — no extra exchange at scale. Keys are chosen so the
    * added exchange doubles as the partitioning downstream operators
    * need most often (events by user_id: the session/window family's
    * own exchange). Results are partitioning-independent by contract
    * (every registered query is oracle-hash-gated; positional ops take
    * explicit order columns).
    */
  private def fanOut(df: DataFrame, name: String, key: String): DataFrame = {
    if (!Tables.fanOutEnabled) return df
    val cores = spark.sparkContext.defaultParallelism
    val splits = Tables.scanSplits(spark, s"$dir/$name.parquet")
    if (splits >= cores) df else df.repartition(cores, col(key))
  }
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  // the two big relational tables fan out on their join key: the added
  // exchange IS the distribution the order-keyed joins/windows need
  // (q03/q86 reuse it outright), and the stat/melt/aggregate stages
  // stop running on the scan's single split at test SFs. Paired A/B,
  // round 15: q64 -57%, q08 -45%, q22 -42%, q86 -27%, q01 -24%;
  // q03/q17/q56/d24 flat; q12 +0.2 s / p06 +0.19 s (range-sort queries
  // that gain nothing from the pre-partitioning) accepted against the
  // ~3 s the wins return on this 12-query set.
  def orders: DataFrame = orders(fan = true)
  def lineitem: DataFrame = fanOut(t("lineitem"), "lineitem", "l_orderkey")

  /** `fan = false` opts an orders consumer out of the scan fan-out —
    * the q12 case (round 16): a query whose only structure is a
    * RANGE-sorted window/order on a different key (o_custkey) gains
    * nothing from the o_orderkey hash exchange and pays it whole
    * (isolated min 0.740 s with vs 0.616 s without, quiet paired). */
  def orders(fan: Boolean): DataFrame =
    if (fan) fanOut(t("orders"), "orders", "o_orderkey") else t("orders")

  /** The events parquet's `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (which Spark reads as a
    * nanosecond long only under the `nanosAsLong` legacy flag) and
    * TIMESTAMP(MICROS) without timezone (read natively as
    * TIMESTAMP_NTZ). This accessor adapts to whichever the files carry
    * and always yields a session-timezone `timestamp` column (UTC in
    * every entrypoint), so downstream windows/as-of joins see one type.
    *
    * DELIBERATE side effects: flips two session-wide read flags BEFORE
    * the read — neither has a per-read option, schema inference itself
    * throws on nanos files without the first, and the driver invokes
    * queries on its own session, so the accessor must be
    * self-sufficient:
    *   - `nanosAsLong`: TIMESTAMP(NANOS) columns read as long (the only
    *     way Spark reads them at all), converted to micros below;
    *   - `inferTimestampNTZ.enabled=false`: TIMESTAMP(MICROS)
    *     isAdjustedToUTC=false columns read DIRECTLY as session-tz
    *     `timestamp` in the vectorized reader — identical values under
    *     the UTC session, but without the NTZ→TZ `Cast`, whose per-row
    *     LocalDateTime round-trip measured ~13% on the events bench
    *     family (4.79 s → 5.44 s over q23/q36/q38/q57/q59/q67 at
    *     sf0.1, reps=5). */
  def events: DataFrame = events(fan = true)

  /** `fan = false` opts a consumer out of the scan fan-out: the right
    * call for queries keyed by something other than user_id (q23/q83
    * aggregate by hour/event_type; q57's post-union window cannot reuse
    * the partitioning) — for them the user_id exchange is pure waste,
    * measured +34…116% at sf0.1. User-keyed consumers (sessions,
    * resample grids, per-user chains) keep the default. */
  def events(fan: Boolean): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // fan out BEFORE the ts projection so the conversion (and every
    // downstream JSON extraction) runs wide; user_id because the
    // session/window family re-keys on it anyway — their exchange and
    // this one are the same node when the plan allows reuse
    val raw =
      if (fan) fanOut(t("events"), "events", "user_id") else t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long: truncate to micros (floor for post-epoch values)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000").cast("long")))
      case _ =>
        // already session-tz timestamp (micros files); cast is a no-op
        // guard for any future variant
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents: DataFrame = documents(fan = true)

  /** `fan = false` opts a documents consumer out of the scan fan-out —
    * the p06 case (round 16): a global RANGE-sort prefix sum over
    * doc_id cannot reuse the doc_id HASH exchange, and its per-row scan
    * compute (a length subtraction) is too cheap to need widening
    * (isolated min 0.363 s with vs 0.178 s without, quiet paired). */
  def documents(fan: Boolean): DataFrame =
    if (fan) fanOut(t("documents"), "documents", "doc_id") else t("documents")
  // embeddings deliberately NOT fanned out BY DEFAULT: measured
  // net-negative for the family (round 15 paired A/B: s01 +176%,
  // s07 +153%, s05 +75%, s02 +81%, s03 +55%, s16 +49%) — the kNN
  // queries broadcast their query sample and scan the corpus once, so
  // the extra exchange moves every embedding array for nothing
  def embeddings: DataFrame = embeddings(fan = false)

  /** `fan = true` opts a consumer INTO the scan fan-out (round 16) —
    * the inverse of the events/documents opt-out: the iterative
    * clustering family (d10/d11) and the PQ encode pass (s11) pay
    * multi-second scan-local vector math that the round-15 measurement
    * showed benefits from widening (d10 −11/−24%, s11 −9/−11% paired)
    * even though the family default stays bare. */
  def embeddings(fan: Boolean): DataFrame =
    if (fan) fanOut(t("embeddings"), "embeddings", "vec_id")
    else t("embeddings")
}

object Tables {
  /** Kill switch for [[Tables.fanOut]] (A/B measurement + escape hatch):
    * SPARK_GRAFT_SCAN_FANOUT=0 restores the bare scans. */
  private[graft] def fanOutEnabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_SCAN_FANOUT", "1") != "0"

  /** (dir path -> input bytes) memo — file METADATA only (the fan-out
    * split estimate), never data or results; avoids re-stat per
    * accessor call within a run. */
  private val bytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Estimated scan-split count for `path`: input bytes over
    * `spark.sql.files.maxPartitionBytes` — the same quantity Spark's
    * file source uses to slice a scan, minus the open-cost refinement
    * (irrelevant for the single-file test tables and an underestimate
    * never flips the fan-out the wrong way: fewer estimated splits only
    * widens a scan that was already narrow). */
  private[graft] def scanSplits(spark: SparkSession, path: String): Long = {
    // stat OUTSIDE the memo and cache only successes: a transient stat
    // failure memoized as 0 bytes would pin the fan-out ON for a
    // production-sized table for the JVM's lifetime (a silent
    // cluster-wide repartition of the largest relations). On failure,
    // warn and treat the table as big (splits = Long.MaxValue → fan-out
    // OFF), preserving the "identity at scale" guarantee.
    val cached = bytesCache.get(path)
    val bytes: Long =
      if (cached != null) cached
      else {
        try {
          val hp = new org.apache.hadoop.fs.Path(path)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val len = fs.getContentSummary(hp).getLength
          bytesCache.put(path, len)
          len
        } catch {
          case e: Throwable =>
            org.slf4j.LoggerFactory.getLogger("graft.Tables").warn(
              s"stat of $path failed (${e.getClass.getName}: " +
                s"${e.getMessage}); treating as at-scale (no fan-out) this call")
            return Long.MaxValue
        }
      }
    val maxSplit =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
          .stripSuffix("b"))
      catch { case _: Throwable => 134217728L }
    math.max(1L, (bytes + maxSplit - 1) / maxSplit)
  }
}
