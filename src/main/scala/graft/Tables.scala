package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy accessors for the driver-generated parquet test tables
  * (TESTDATA.md). Each accessor is a fresh lazy scan — Catalyst prunes
  * columns and pushes filters into the parquet reader per-query. */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

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
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = t("events")
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
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
